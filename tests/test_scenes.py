"""Scene-change keyframe sampling (video_frame_sampling.py:310-499
re-expression): find_peaks replica, auto prominence, scene assembly,
and the JVM best-frame plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from docling_spark.operators.scenes import (
    auto_prominence,
    detect_scenes,
    detect_scenes_kernel,
    find_peaks,
    local_maxima,
    peak_prominences,
    scene_best_frames,
    select_by_distance,
)


def test_local_maxima_plateau_midpoint():
    x = np.array([0, 1, 0, 2, 2, 2, 0, 3, 0], dtype=float)
    assert local_maxima(x).tolist() == [1, 4, 7]  # plateau [3,5] -> mid 4


def test_prominence_valley_rule():
    #          0  1  2  3  4  5  6
    x = np.array([0, 5, 2, 3, 2, 9, 0], dtype=float)
    peaks = local_maxima(x)
    assert peaks.tolist() == [1, 3, 5]
    proms = peak_prominences(x, peaks)
    # peak@1: left edge min 0, right walk stops at 9 with min 2 -> 5-2=3
    # peak@3: valleys 2 and 2 -> 1;  peak@5: global -> 9-0=9
    assert proms.tolist() == [3.0, 1.0, 9.0]


def test_distance_keeps_higher_peak():
    x = np.array([0, 5, 0, 7, 0], dtype=float)
    peaks = local_maxima(x)
    kept = select_by_distance(x, peaks, distance=3)
    assert kept.tolist() == [3]
    # exact separation == distance survives
    assert select_by_distance(x, peaks, distance=2).tolist() == [1, 3]


def test_find_peaks_order_distance_then_prominence():
    # two nearby peaks: distance drops the lower FIRST, so the survivor's
    # prominence is measured without it
    x = np.array([0, 4, 1, 5, 0, 0.2, 0], dtype=float)
    got = find_peaks(x, prominence=4.5, distance=3)
    assert got.tolist() == [3]


def test_auto_prominence_floor_and_mad():
    flat = np.full(50, 0.002)
    assert auto_prominence(flat) == pytest.approx(0.012)  # the floor
    noisy = np.array([0.1, 0.3] * 25)
    # median 0.2, MAD 0.1*1.4826 -> 0.2 + 5*0.14826
    assert auto_prominence(noisy) == pytest.approx(0.2 + 5 * 0.14826)


def test_detect_scenes_kernel_end_to_end():
    ts = np.arange(20, dtype=float)          # 1 fps probes
    diffs = np.full(19, 0.02)
    diffs[[5, 12]] = 0.92                    # cuts at t=5 and t=12
    scenes = detect_scenes_kernel(ts, diffs)
    assert scenes == [(0, 0.0, 5.0), (1, 5.0, 12.0), (2, 12.0, 19.0)]


def test_detect_scenes_kernel_start_guard():
    # a peak before min_scene_duration_seconds is discarded
    ts = np.arange(10, dtype=float)
    diffs = np.full(9, 0.02)
    diffs[1] = 0.92                          # t=1 < 2.0 -> invalid
    assert detect_scenes_kernel(ts, diffs) == [(0, 0.0, 9.0)]


def test_detect_scenes_operator(spark):
    rows = []
    for m in ("v1", "v2"):
        cut = 5 if m == "v1" else 8
        for i in range(15):
            rows.append((m, i, float(i), 0.92 if i == cut else 0.02))
    df = spark.createDataFrame(
        rows, "media_id string, probe_idx int, ts double, diff double")
    got = sorted((r["media_id"], r["scene_id"], r["start_time"], r["end_time"])
                 for r in detect_scenes(df).collect())
    assert got == [
        ("v1", 0, 0.0, 5.0), ("v1", 1, 5.0, 14.0),
        ("v2", 0, 0.0, 8.0), ("v2", 1, 8.0, 14.0),
    ]


def test_scene_best_frames_band_argmax_and_plan(spark):
    scenes = spark.createDataFrame(
        [("v1", 0, 0.0, 10.0)],
        "media_id string, scene_id int, start_time double, end_time double")
    # central 40% band of [0,10] = [3,7]
    cands = spark.createDataFrame(
        [("v1", 1.0, 99.0),   # outside band -> ignored despite sharpness
         ("v1", 3.0, 5.0),
         ("v1", 5.0, 8.0),
         ("v1", 6.0, 8.0),    # tie with ts=5 -> earliest wins
         ("v1", 9.0, 50.0)],  # outside band
        "media_id string, ts double, sharpness double")
    out = scene_best_frames(cands, scenes)
    rows = out.collect()
    assert [(r["scene_id"], r["frame_ts"], r["sharpness"]) for r in rows] \
        == [(0, 5.0, 8.0)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
