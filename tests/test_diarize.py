"""Speaker diarization (utils/speaker_diarization.py re-expression):
Ward clustering kernel, silhouette auto-k, run merging with last-segment
extension, and max-overlap speaker assignment."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from docling_spark.operators.diarize import (
    assign_speakers,
    diarize_windows,
    estimate_num_speakers,
    silhouette,
    speaker_segments,
    ward_labels,
)


def _blobs(centers, per=4, jitter=0.01):
    pts, labels = [], []
    for c, ctr in enumerate(centers):
        for i in range(per):
            pts.append(np.array(ctr, dtype=float) + jitter * (i + 1))
            labels.append(c)
    return np.array(pts), np.array(labels)


def test_ward_recovers_separated_blobs():
    x, truth = _blobs([[0, 0], [10, 0], [0, 10]])
    got = ward_labels(x, 3)
    # same-partition check (label numbering is canonical-by-first-row)
    assert [got[i] == got[j] for i in range(12) for j in range(12)] == [
        truth[i] == truth[j] for i in range(12) for j in range(12)
    ]


def test_ward_deterministic_tiebreak():
    x = np.array([[0.0, 0.0], [1.0, 0.0], [10.0, 0.0], [11.0, 0.0]])
    assert ward_labels(x, 2).tolist() == [0, 0, 1, 1]
    assert ward_labels(x, 2).tolist() == ward_labels(x, 2).tolist()


def test_silhouette_tight_blobs_near_one():
    x, truth = _blobs([[0, 0], [10, 0]])
    assert silhouette(x, truth) > 0.9
    # deliberately wrong split scores much worse
    bad = np.array([0, 1] * 4)
    assert silhouette(x, bad) < 0.2


def test_estimate_num_speakers_picks_truth():
    for k in (2, 3, 4):
        centers = [[10 * i, 10 * (i % 2)] for i in range(k)]
        x, _ = _blobs(centers)
        assert estimate_num_speakers(x) == k


def test_diarize_windows_auto_k_and_canonical_ids(spark):
    # conv c1: speakers in blocks 0,1,0 — SPEAKER_00 must be the FIRST
    # heard block even though it re-appears later
    rows = []
    base = {0: [10.0, 0.0], 1: [0.0, 10.0]}
    pattern = [0, 0, 0, 1, 1, 1, 0, 0]
    for i, s in enumerate(pattern):
        rows.append(("c1", i, i * 0.5,
                     [base[s][0] + 0.01 * i, base[s][1]]))
    df = spark.createDataFrame(
        rows, "conv_id string, win_idx int, ts double, embedding array<double>"
    )
    got = {r["win_idx"]: r["speaker"]
           for r in diarize_windows(df).collect()}
    assert [got[i] for i in range(8)] == [
        "SPEAKER_00", "SPEAKER_00", "SPEAKER_00",
        "SPEAKER_01", "SPEAKER_01", "SPEAKER_01",
        "SPEAKER_00", "SPEAKER_00",
    ]


def test_speaker_segments_runs_and_last_extension(spark):
    rows = [("c1", i, i * 0.5, spk, 9.9) for i, spk in enumerate(
        ["SPEAKER_00"] * 3 + ["SPEAKER_01"] * 2 + ["SPEAKER_00"] * 1)]
    df = spark.createDataFrame(
        rows, "conv_id string, win_idx int, ts double, speaker string, "
              "audio_len double")
    segs = speaker_segments(df, audio_len_col="audio_len").collect()
    got = sorted((r["seg_idx"], r["start_time"], r["end_time"], r["speaker"])
                 for r in segs)
    assert got == [
        (0, 0.0, 1.5, "SPEAKER_00"),   # windows 0-2: max ts 1.0 + 0.5
        (1, 1.5, 2.5, "SPEAKER_01"),   # windows 3-4
        (2, 2.5, 9.9, "SPEAKER_00"),   # last run extends to audio end
    ]


def test_assign_speakers_max_overlap_and_null(spark):
    segs = spark.createDataFrame(
        [("c1", 0, 0.0, 2.0, "SPEAKER_00"),
         ("c1", 1, 2.0, 5.0, "SPEAKER_01")],
        "conv_id string, seg_idx int, start_time double, end_time double, "
        "speaker string")
    items = spark.createDataFrame(
        [("c1", 0.5, 1.5, "a"),     # inside seg 0
         ("c1", 1.5, 3.5, "b"),     # overlaps both, seg 1 wins (2.0 > 0.5)
         ("c1", 1.0, 3.0, "c"),     # exact tie (1.0 vs 1.0): earliest seg
         ("c1", 7.0, 8.0, "d"),     # no overlap -> NULL
         ("c2", 0.5, 1.5, "e")],    # different conv, no segments -> NULL
        "conv_id string, start_time double, end_time double, text string")
    got = {r["text"]: r["speaker"] for r in
           assign_speakers(items, segs).collect()}
    assert got == {"a": "SPEAKER_00", "b": "SPEAKER_01",
                   "c": "SPEAKER_00", "d": None, "e": None}


def test_assignment_plan_is_keyed_join_not_cartesian(spark):
    segs = spark.createDataFrame(
        [("c1", 0, 0.0, 2.0, "SPEAKER_00")],
        "conv_id string, seg_idx int, start_time double, end_time double, "
        "speaker string")
    items = spark.createDataFrame(
        [("c1", 0.5, 1.5, "a")],
        "conv_id string, start_time double, end_time double, text string")
    plan = assign_speakers(items, segs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
