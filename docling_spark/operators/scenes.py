"""Scene-change video keyframe sampling — distributed re-expression of
the reference's SimpleSceneChangeFrameSampler
(utils/video_frame_sampling.py:310-499).

The reference probes ONE video with ffmpeg, computes the mean-abs-diff
signal between consecutive probe thumbnails, smooths it, finds scene
cuts as prominence-filtered local peaks (scipy.signal.find_peaks with a
per-video auto-calibrated prominence, :85-103), then picks the sharpest
frame (Laplacian variance) in the central 40% band of each scene
(:378-432).

Decode is the stubbed boundary, exactly like multimodal.py: probe rows
arrive WITH their diff signal, candidate frames WITH their sharpness
score. Everything else is real and distributed:

- peak detection is a bounded per-video kernel (signal length =
  duration x probe_fps) in one ``applyInPandas`` group per video —
  millions of videos in parallel, constant work per group. The
  find_peaks subset (plateau midpoints, height-priority distance
  selection THEN prominence filter — scipy's filter order) is
  re-implemented from scratch in numpy; no scipy in the container.
- best-frame selection is pure JVM: a video-keyed equi-join of
  candidate frames against scenes, the 40% mid-band filter, and one
  argmax window (ties -> earliest candidate, matching the reference's
  strictly-greater scan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

AUTO_PROMINENCE_FLOOR = 0.012  # video_frame_sampling.py:76
AUTO_PROMINENCE_K = 5.0        # video_frame_sampling.py:80


def auto_prominence(diffs: np.ndarray) -> float:
    """video_frame_sampling.py:85-103: median ambient motion + K x MAD
    (scaled to sigma), floored — robust so the cut spikes themselves do
    not inflate the threshold."""
    median = float(np.median(diffs))
    mad = float(np.median(np.abs(diffs - median))) * 1.4826
    return max(AUTO_PROMINENCE_FLOOR, median + AUTO_PROMINENCE_K * mad)


def local_maxima(x: np.ndarray) -> np.ndarray:
    """Strict local maxima with plateau handling: a run of equal values
    rising on the left and falling on the right yields its midpoint
    (scipy _local_maxima_1d semantics)."""
    peaks = []
    i, n = 1, len(x)
    while i < n - 1:
        if x[i - 1] < x[i]:
            j = i
            while j < n - 1 and x[j + 1] == x[i]:
                j += 1
            if j < n - 1 and x[j + 1] < x[i]:
                peaks.append((i + j) // 2)
            i = j + 1
        else:
            i += 1
    return np.array(peaks, dtype=np.int64)


def peak_prominences(x: np.ndarray, peaks: np.ndarray) -> np.ndarray:
    """scipy peak_prominences (no wlen): walk left/right from each peak
    until a strictly higher sample or the signal edge; the prominence is
    the peak height above the higher of the two valley minima."""
    proms = np.empty(len(peaks))
    for k, p in enumerate(peaks):
        h = x[p]
        lmin = h
        i = p - 1
        while i >= 0 and x[i] <= h:
            lmin = min(lmin, x[i])
            i -= 1
        rmin = h
        i = p + 1
        while i < len(x) and x[i] <= h:
            rmin = min(rmin, x[i])
            i += 1
        proms[k] = h - max(lmin, rmin)
    return proms


def select_by_distance(x: np.ndarray, peaks: np.ndarray,
                       distance: int) -> np.ndarray:
    """scipy _select_by_peak_distance: highest peaks win; any peak within
    ``distance`` samples of an already-kept higher peak is dropped."""
    keep = np.ones(len(peaks), dtype=bool)
    # stable sort by height then position: scipy iterates highest-last
    # in its priority array; equal heights resolve to the later index
    # winning first — replicate by sorting (height, index) descending.
    order = sorted(range(len(peaks)), key=lambda k: (x[peaks[k]], peaks[k]),
                   reverse=True)
    for k in order:
        if not keep[k]:
            continue
        for j in range(len(peaks)):
            if j != k and keep[j] and abs(int(peaks[j]) - int(peaks[k])) < distance:
                if (x[peaks[j]], peaks[j]) < (x[peaks[k]], peaks[k]):
                    keep[j] = False
    return peaks[keep]


def find_peaks(x: np.ndarray, prominence: float,
               distance: int) -> np.ndarray:
    """The scipy.signal.find_peaks subset the sampler uses, with scipy's
    filter ORDER: local maxima → distance selection (height priority) →
    prominence filter (video_frame_sampling.py:485 call site)."""
    peaks = local_maxima(x)
    if len(peaks) == 0:
        return peaks
    if distance > 1:
        peaks = select_by_distance(x, peaks, distance)
    proms = peak_prominences(x, peaks)
    return peaks[proms >= prominence]


def detect_scenes_kernel(
    ts: np.ndarray,
    diffs: np.ndarray,
    probe_fps: float = 1.0,
    prominence: float | None = None,
    min_scene_duration_seconds: float = 2.0,
    smooth_window: int = 1,
) -> list[tuple[int, float, float]]:
    """detect_scenes (video_frame_sampling.py:424-483) on a precomputed
    probe signal: ts = probe timestamps (len m), diffs = consecutive
    mean-abs-diffs (len m-1). Returns (scene_id, start, end) tuples."""
    if len(ts) < 2:
        return []
    w = max(1, smooth_window)
    smoothed = np.convolve(diffs, np.ones(w) / w, mode="same")
    min_dist = max(1, int(min_scene_duration_seconds * probe_fps))
    prom = prominence if prominence is not None else auto_prominence(diffs)
    peaks = find_peaks(smoothed, prominence=prom, distance=min_dist)
    valid = [p for p in peaks if ts[p] >= min_scene_duration_seconds]
    boundaries = [float(ts[0])] + [float(ts[p]) for p in valid]
    end_time = float(ts[-1])
    out = []
    for idx, start in enumerate(boundaries):
        stop = boundaries[idx + 1] if idx + 1 < len(boundaries) else end_time
        out.append((idx, start, stop))
    return out


def detect_scenes(
    probes: DataFrame,
    probe_fps: float = 1.0,
    prominence: float | None = None,
    min_scene_duration_seconds: float = 2.0,
    smooth_window: int = 1,
    media_col: str = "media_id",
) -> DataFrame:
    """(media, probe_idx, ts, diff) rows → (media, scene_id, start_time,
    end_time): one bounded kernel group per video, parallel across the
    corpus. ``diff`` on probe i is the mean-abs-diff to probe i+1; the
    last probe's diff is ignored/NULL (there is no successor)."""
    media_type = {fl.name: fl.dataType.simpleString()
                  for fl in probes.schema.fields}[media_col]
    schema = (f"{media_col} {media_type}, scene_id int, "
              f"start_time double, end_time double")

    # One JVM aggregation packs each video's signal into a single row
    # (array_sort on the struct orders by probe_idx), then ONE
    # mapInPandas pass runs the kernel over Arrow-batched videos —
    # thousands of videos per pandas call instead of one pandas group
    # per video (applyInPandas per-group overhead measured 8.3 s vs
    # ~1 s for the same sf0.1 corpus). State per row stays bounded by
    # video duration x probe_fps, the same invariant as before.
    packed = probes.groupBy(media_col).agg(
        F.array_sort(
            F.collect_list(F.struct("probe_idx", "ts", "diff"))
        ).alias("sig")
    )
    # byte-small, CPU-bearing rows: the column-less round-robin
    # repartition is user-pinned, so neither Catalyst (redundant-with-agg
    # elision) nor AQE (size-based coalescing) can serialize the kernel
    # onto one core (see diarize.py for the measured 16x)
    packed = packed.repartition(
        probes.sparkSession.sparkContext.defaultParallelism)

    def run(batches):
        for pdf in batches:
            out = {media_col: [], "scene_id": [], "start_time": [],
                   "end_time": []}
            for mid, sig in zip(pdf[media_col], pdf["sig"]):
                ts = np.array([r["ts"] for r in sig], dtype=np.float64)
                diffs = np.array([r["diff"] for r in sig],
                                 dtype=np.float64)[:-1]
                for sid, s0, s1 in detect_scenes_kernel(
                        ts, diffs, probe_fps=probe_fps,
                        prominence=prominence,
                        min_scene_duration_seconds=min_scene_duration_seconds,
                        smooth_window=smooth_window):
                    out[media_col].append(mid)
                    out["scene_id"].append(sid)
                    out["start_time"].append(s0)
                    out["end_time"].append(s1)
            yield pd.DataFrame(out)

    return packed.mapInPandas(run, schema=schema)


def scene_best_frames(
    candidates: DataFrame,
    scenes: DataFrame,
    media_col: str = "media_id",
) -> DataFrame:
    """Sharpest frame in the central 40% band of each scene
    (_best_frame, video_frame_sampling.py:378-432): window =
    [mid − 0.4·len/2, mid + 0.4·len/2]; argmax Laplacian-variance
    sharpness, ties → earliest candidate (the reference's
    strictly-greater scan keeps the first maximum). Scenes with no
    candidate in the band yield no row (frame decode at the midpoint is
    the stubbed ffmpeg boundary).

    Plan: video-keyed equi-join + band filter + one argmax window —
    candidates and scenes of a video co-locate; scene counts per video
    are bounded by duration."""
    seg = scenes.select(
        F.col(media_col).alias("_m"),
        "scene_id",
        F.col("start_time").alias("_s0"),
        F.col("end_time").alias("_s1"),
    )
    j = candidates.join(seg, candidates[media_col] == seg["_m"], "inner")
    mid = (F.col("_s0") + F.col("_s1")) / 2.0
    half = (F.col("_s1") - F.col("_s0")) / 2.0 * 0.4
    lo = F.greatest(F.col("_s0"), mid - half)
    hi = F.least(F.col("_s1"), mid + half)
    j = j.filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
    w = Window.partitionBy("_m", "scene_id").orderBy(
        F.desc("sharpness"), F.asc("ts"))
    return (
        j.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(candidates[media_col], "scene_id",
                F.col("ts").alias("frame_ts"), "sharpness")
    )
