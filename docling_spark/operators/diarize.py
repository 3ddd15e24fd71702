"""Speaker diarization — distributed re-expression of the reference's
audio speaker pipeline (utils/speaker_diarization.py).

The reference diarizes ONE wav file at a time: Resemblyzer encodes 1.5 s
sliding windows (step 0.5 s) into speaker embeddings, sklearn
AgglomerativeClustering (Ward) groups them — speaker count auto-selected
by silhouette score over n ∈ [2, 8] (speaker_diarization.py:45-68) —
consecutive same-speaker windows merge into segments
(:168-184), and each ASR transcript item takes the label of the
max-overlap segment (assign_speakers, :199-230).

Here the unit of work is a conversation, not a process: millions of
conversations diarize in parallel, each one's windows bounded by its
audio length, so the clustering kernel is a bounded-size
``applyInPandas`` group (the voice-encoder model is the stubbed
boundary — windows arrive WITH embedding vectors, mirroring how
multimodal.py stubs decode kernels). Everything around the kernel is
JVM-side: run merging is a lag/sum window chain (classic
sessionization) and speaker assignment is a conversation-keyed
equi-join + argmax window — no per-row Python, no unbounded state.

Clustering is a from-scratch Ward agglomeration (Lance-Williams
update) with deterministic tie-breaking, and the silhouette score is
computed directly from its definition — both pure numpy, no sklearn in
the container. Speaker ids are canonicalized by FIRST APPEARANCE TIME
(SPEAKER_00 = first heard), which makes labels deterministic and
oracle-derivable where sklearn's cluster indices are arbitrary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MIN_SPEAKERS = 2   # speaker_diarization.py:19
MAX_SPEAKERS = 8   # speaker_diarization.py:21
WINDOW_STEP = 0.5  # speaker_diarization.py:23


# ---------------------------------------------------------------- kernel --

def ward_cuts(x: np.ndarray, cuts: list[int]) -> dict[int, np.ndarray]:
    """Ward agglomerative clustering, from scratch — ONE dendrogram,
    labels snapshotted at every requested cluster count.

    Lance-Williams recurrence for Ward linkage on squared euclidean
    distances: when clusters i and j merge,
        d²(k, i∪j) = ((n_i+n_k) d²(k,i) + (n_j+n_k) d²(k,j)
                      − n_k d²(i,j)) / (n_i+n_j+n_k).
    Ties break on the smallest (i, j) pair, so the dendrogram is
    deterministic — and because agglomerative clusterings are NESTED,
    every cut of the same merge sequence equals a fresh run stopped at
    that count. Snapshotting all cuts in one pass is what keeps the
    silhouette auto-k sweep O(m³) total instead of O(k·m³).
    O(m³) worst case over m windows per conversation — m is bounded by
    audio length (the reference's per-file regime), so the kernel cost
    is constant per conversation, never corpus-scale.
    """
    m = len(x)
    out: dict[int, np.ndarray] = {}

    def snapshot(members: dict[int, list[int]]) -> np.ndarray:
        labels = np.empty(m, dtype=np.int64)
        for c, key in enumerate(
                sorted(members, key=lambda c: min(members[c]))):
            labels[np.array(members[key])] = c
        return labels

    want = sorted(set(cuts), reverse=True)  # largest cut reached first
    for n in [n for n in want if n >= m]:
        out[n] = np.arange(m)
    want = [n for n in want if n < m]
    if not want:
        return out
    lowest = want[-1]
    diff = x[:, None, :] - x[None, :, :]
    d2 = (diff * diff).sum(axis=2) / 2.0  # Ward d² between singletons
    np.fill_diagonal(d2, np.inf)
    sizes = np.ones(m)
    active = np.ones(m, dtype=bool)
    # members[c] = row indices belonging to cluster c
    members: dict[int, list[int]] = {i: [i] for i in range(m)}
    for step in range(m - lowest):
        # row-major argmin = lexicographically-smallest (i, j) among ties,
        # the deterministic dendrogram guarantee; vectorized so a
        # minutes-long conversation (hundreds of windows) stays fast
        flat = int(np.argmin(d2))
        i, j = divmod(flat, m)
        if i > j:
            i, j = j, i
        dij = d2[i, j]
        ni, nj = sizes[i], sizes[j]
        act = np.flatnonzero(active)
        act = act[(act != i) & (act != j)]
        nk = sizes[act]
        dk = ((ni + nk) * d2[act, i] + (nj + nk) * d2[act, j] - nk * dij) / (
            ni + nj + nk
        )
        d2[act, i] = dk
        d2[i, act] = dk
        sizes[i] = ni + nj
        members[i].extend(members.pop(j))
        active[j] = False
        d2[j, :] = np.inf
        d2[:, j] = np.inf
        n_now = m - step - 1
        if n_now in want:
            out[n_now] = snapshot(members)
    return out


def ward_labels(x: np.ndarray, n_clusters: int) -> np.ndarray:
    """One cut of :func:`ward_cuts` (kept as the single-cut API)."""
    return ward_cuts(x, [n_clusters])[n_clusters]


def silhouette(x: np.ndarray, labels: np.ndarray,
               d: np.ndarray | None = None) -> float:
    """Mean silhouette coefficient, straight from the definition:
    s(i) = (b(i) − a(i)) / max(a(i), b(i)) with a = mean intra-cluster
    distance (excluding self), b = min over other clusters of the mean
    distance to that cluster; singleton clusters score 0. ``d``: the
    pairwise euclidean matrix, precomputed once by the auto-k sweep."""
    m = len(x)
    if d is None:
        diff = x[:, None, :] - x[None, :, :]
        d = np.sqrt((diff * diff).sum(axis=2))
    uniq = np.unique(labels)
    if len(uniq) < 2:
        return -1.0
    # vectorized: one m×k matrix of mean distances to each cluster
    # (identical arithmetic to the per-row definition loop — sums and
    # divisions in the same order per element)
    k = len(uniq)
    member = labels[:, None] == uniq[None, :]           # m×k
    counts = member.sum(axis=0)                         # k
    sums = d @ member                                   # m×k mean-dist sums
    own_col = np.searchsorted(uniq, labels)
    rows = np.arange(m)
    n_same = counts[own_col]
    a = np.where(n_same > 1, sums[rows, own_col] / np.maximum(n_same - 1, 1),
                 0.0)
    other = sums / np.maximum(counts, 1)[None, :]
    other[rows, own_col] = np.inf
    b = other.min(axis=1)
    denom = np.maximum(a, b)
    s = np.where((n_same > 1) & (denom > 0), (b - a) / np.where(
        denom > 0, denom, 1.0), 0.0)
    return float(s.mean())


def estimate_num_speakers(x: np.ndarray) -> int:
    """speaker_diarization.py:45-68: best silhouette over n ∈ [2, 8]
    (capped below the window count); ties keep the smaller n. One
    dendrogram + one distance matrix serve every n (the sweep is a
    set of cuts of the same merge sequence)."""
    ns = list(range(MIN_SPEAKERS, min(MAX_SPEAKERS + 1, len(x))))
    if not ns:
        return MIN_SPEAKERS
    cuts = ward_cuts(x, ns)
    diff = x[:, None, :] - x[None, :, :]
    d = np.sqrt((diff * diff).sum(axis=2))
    best_n, best_score = MIN_SPEAKERS, -1.0
    for n in ns:
        labels = cuts[n]
        if len(np.unique(labels)) < 2:
            continue
        score = silhouette(x, labels, d=d)
        if score > best_score:
            best_n, best_score = n, score
    return best_n


def _diarize_one(pdf: pd.DataFrame, num_speakers: int | None) -> pd.DataFrame:
    pdf = pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
    x = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
    if len(x) == 0:
        return pdf.assign(speaker=pd.Series([], dtype=str))
    if len(x) == 1:
        return pdf.assign(speaker="SPEAKER_00")
    n = num_speakers if num_speakers is not None else estimate_num_speakers(x)
    raw = ward_labels(x, min(n, len(x)))
    # canonical ids by first appearance time: SPEAKER_00 = first heard
    order: dict[int, int] = {}
    for lab in raw:
        if lab not in order:
            order[lab] = len(order)
    pdf["speaker"] = [f"SPEAKER_{order[lab]:02d}" for lab in raw]
    return pdf


def diarize_windows(
    windows: DataFrame,
    num_speakers: int | None = None,
    conv_col: str = "conv_id",
) -> DataFrame:
    """(conv, ts, embedding) windows → per-window speaker labels.

    One applyInPandas group per conversation: the reference's per-file
    clustering (speaker_diarization.py:165-166) becomes per-conversation
    work, parallel across the corpus. ``num_speakers=None`` auto-selects
    by silhouette exactly as the reference does.
    """
    conv_type = {fl.name: fl.dataType.simpleString()
                 for fl in windows.schema.fields}[conv_col]
    schema = f"{conv_col} {conv_type}, win_idx int, ts double, speaker string"

    # pack each conversation's windows into one row JVM-side, then run
    # the kernel over Arrow-batched conversations in a single mapInPandas
    # pass — thousands of conversations per pandas call instead of one
    # pandas group per conversation (the scenes.py lesson: per-group
    # applyInPandas overhead dominated a cheap kernel ~8x)
    packed = windows.groupBy(conv_col).agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "win_idx", "embedding"))
        ).alias("wins")
    )
    # packed rows are BYTE-small but CPU-heavy (Ward + 7x silhouette per
    # conversation). A hash repartition on conv is elided by Catalyst
    # (the agg exchange already satisfies it) and the surviving
    # ENSURE_REQUIREMENTS exchange gets AQE-coalesced to ONE partition by
    # byte size — measured 23 s single-core vs 1.4 s fanned out. The
    # column-less round-robin repartition is user-pinned (never elided,
    # never coalesced) and balances kernel work perfectly.
    packed = packed.repartition(
        windows.sparkSession.sparkContext.defaultParallelism)

    def run(batches):
        for pdf in batches:
            out = {conv_col: [], "win_idx": [], "ts": [], "speaker": []}
            for cid, wins in zip(pdf[conv_col], pdf["wins"]):
                one = pd.DataFrame({
                    conv_col: [cid] * len(wins),
                    "win_idx": [int(r["win_idx"]) for r in wins],
                    "ts": [float(r["ts"]) for r in wins],
                    "embedding": [r["embedding"] for r in wins],
                })
                got = _diarize_one(one, num_speakers)
                out[conv_col].extend(got[conv_col])
                out["win_idx"].extend(got["win_idx"])
                out["ts"].extend(got["ts"])
                out["speaker"].extend(got["speaker"])
            yield pd.DataFrame(out)

    return packed.mapInPandas(run, schema=schema)


# ------------------------------------------------------------- JVM plans --

def speaker_segments(
    labeled: DataFrame,
    step: float = WINDOW_STEP,
    conv_col: str = "conv_id",
    audio_len_col: str | None = None,
) -> DataFrame:
    """Merge consecutive same-speaker windows into segments
    (speaker_diarization.py:168-184): a segment runs from its first
    window's ts to last-window ts + step; the conversation's LAST
    segment extends to the audio end (len(wav)/sr) when an audio-length
    column is supplied.

    Pure window functions: label-change flag → running sum = run id →
    groupBy run. One shuffle keyed by conversation.
    """
    w = Window.partitionBy(conv_col).orderBy("ts")
    runs = (
        labeled.withColumn(
            "chg",
            (F.lag("speaker").over(w).isNull()
             | (F.lag("speaker").over(w) != F.col("speaker"))).cast("int"),
        )
        .withColumn("run_id", F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    aggs = [
        F.min("ts").alias("start_time"),
        (F.max("ts") + F.lit(step)).alias("end_raw"),
        F.first("speaker").alias("speaker"),
    ]
    if audio_len_col:
        aggs.append(F.max(audio_len_col).alias("_alen"))
    seg = runs.groupBy(conv_col, "run_id").agg(*aggs)
    wc = Window.partitionBy(conv_col)
    if audio_len_col:
        seg = seg.withColumn(
            "end_time",
            F.when(F.col("run_id") == F.max("run_id").over(wc), F.col("_alen"))
            .otherwise(F.col("end_raw")),
        ).drop("_alen")
    else:
        seg = seg.withColumn("end_time", F.col("end_raw"))
    return seg.select(
        conv_col, (F.col("run_id") - 1).cast("int").alias("seg_idx"),
        "start_time", "end_time", "speaker",
    )


def assign_speakers(
    items: DataFrame,
    segments: DataFrame,
    conv_col: str = "conv_id",
    start_col: str = "start_time",
    end_col: str = "end_time",
) -> DataFrame:
    """Label each transcript item with the speaker of its max-overlap
    diarization segment (assign_speakers, speaker_diarization.py:199-230):
    overlap = max(0, min(ends) − max(starts)); strictly-positive overlap
    required; ties keep the earliest segment (the reference's
    strictly-greater scan keeps the first maximum). Items with no
    overlapping segment keep a NULL speaker.

    Plan: conversation-keyed equi-join (items and segments of the same
    conversation co-locate; segment counts per conversation are bounded
    by audio length) + one argmax window per item. No interval
    cross-product, no broadcast of corpus-sized state.
    """
    seg = segments.select(
        F.col(conv_col).alias("_c"),
        F.col("seg_idx"),
        F.col("start_time").alias("_s0"),
        F.col("end_time").alias("_s1"),
        F.col("speaker").alias("_spk"),
    )
    j = items.join(seg, items[conv_col] == seg["_c"], "left")
    overlap = F.greatest(
        F.lit(0.0),
        F.least(F.col(end_col), F.col("_s1"))
        - F.greatest(F.col(start_col), F.col("_s0")),
    )
    j = j.withColumn("_ov", overlap)
    # the argmax window partitions on the item's FULL identity, not just
    # its timing: two items sharing (conv, start, end) — duplicated
    # captions, zero-length items at one timestamp — must each keep
    # their row, not collapse to whichever the rank tie-break picks
    item_key = [c for c in items.columns]
    w = Window.partitionBy(*[items[c] for c in item_key]).orderBy(
        F.desc("_ov"), F.asc("seg_idx"))
    ranked = j.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1)
    return ranked.select(
        *[items[c] for c in items.columns],
        F.when(F.col("_ov") > 0, F.col("_spk")).alias("speaker"),
    )
