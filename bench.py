"""Headline benchmark — prints ONE JSON line.

Runs the flagship extraction pipeline over a deterministic synthetic
transcripts corpus sized to the scale factor, plus representative operator
queries from ``__spark_entry__``, on ``local[$SPARK_GRAFT_CPUS]`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Output: {"metric": "...", "value": <total sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": <sf>, "extract_turns_per_s": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _cpu_ticks() -> tuple[int, int, int]:
    """(busy, idle, steal) jiffies from /proc/stat."""
    with open("/proc/stat") as f:
        p = [int(x) for x in f.readline().split()[1:9]]
    idle = p[3] + p[4]
    steal = p[7] if len(p) > 7 else 0
    return sum(p) - idle, idle, steal


def _cpu_canary() -> float:
    """Fixed pure-Python work, single thread → M ops/s. Engine-independent
    box-speed witness: this box's measured per-core speed varies ~25%
    across measurement windows (VM host frequency/steal states), so the
    canary lets a reader normalize a headline across rounds/boxes instead
    of mistaking a slow window for a code regression."""
    import hashlib

    t0 = time.perf_counter()
    n = 200_000
    h = 0
    for i in range(n):
        h ^= int.from_bytes(
            hashlib.md5(b"canary %d" % i).digest()[:8], "big")
    return round(n / (time.perf_counter() - t0) / 1e6, 3)


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    # Bounded quiet-wait: this box is multi-tenant (neighbor loadavg swings
    # 0.3→33, BENCH/BASELINE.md); a run that starts into a load spike
    # measures the neighbors, not the engine. Wait (bounded) for the spike
    # to pass, and record how long we waited so the reader sees it.
    wait_max = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT_S", "300"))
    wait_thresh = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_LOAD", "4.0"))
    # canary gate: loadavg only sees RUNNABLE neighbors; host-level
    # frequency/steal states show up ONLY in measured per-core speed.
    # BENCH_r04 started at canary 0.678 Mops (vs 0.895 in r3) and every
    # wall inflated ~25-95% — so wait for the box itself to be fast, not
    # just idle. Threshold 0.85 = the bottom of the observed quiet band
    # (0.87-1.1 across r3-r5 measurements).
    canary_thresh = float(os.environ.get("SPARK_GRAFT_BENCH_CANARY_MIN",
                                         "0.85"))
    t_wait0 = time.time()
    canary0 = _cpu_canary()
    while time.time() - t_wait0 < wait_max and \
            (_loadavg() > wait_thresh or canary0 < canary_thresh):
        time.sleep(8.0)
        canary0 = _cpu_canary()
    load_ctx: dict = {"quiet_wait_s": round(time.time() - t_wait0, 1),
                      "loadavg_start": _loadavg(),
                      "cpu_canary_mops_start": canary0,
                      "canary_gate_mops": canary_thresh,
                      "canary_gate_met": canary0 >= canary_thresh}
    ticks0 = _cpu_ticks()
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS",
                                 str(max(int(100_000 * sf), 200))))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("docling-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow batch sizing: 2000 rows ≈ 2-4 MB of typical turns — the
        # measured sweet spot (500 → 36k turns/s, 2000 → 45k, 8000 → 41k
        # on this box); the corpus's few multi-MB oversize payloads only
        # cap the count, not per-row memory
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        # cached-corpus columnar compression off: the scan leg of the
        # extraction pipeline costs more CPU than the Python kernel at
        # this corpus shape; r3 interleaved A/B measured the uncompressed
        # cache scan ~25% cheaper (0.81 s vs 1.08 s full-column read) and
        # every interleaved extraction round faster. Memory is not the
        # binding constraint for the bench corpus (~0.5 GB raw).
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.driver.maxResultSize", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from docling_spark.operators.extract_ops import extract_turns
    from docling_spark.sources.transcripts import transcripts_df

    timings: dict[str, float] = {}

    # headline: extraction throughput over the synthetic transcripts corpus.
    # warm to steady state first (python workers, Arrow buffers, JIT) so the
    # timed pass measures the sustained rate a long-running job sees — same
    # methodology as tools/scaling_bench.py.
    tr = transcripts_df(spark, n_convs, partitions=CPUS * 2).cache()
    tr.count()
    # TWO untimed warm-up passes: measured pass walls keep falling through
    # pass ~3 of a fresh JVM (python-worker imports of all format engines,
    # Arrow buffer pools, JIT) — one warm-up leaves the first timed pass
    # ~8% cold (r3 A/B: walls 3.65, 3.45, 3.35 after one warm-up)
    extract_turns(tr).groupBy("status").count().collect()
    extract_turns(tr).groupBy("status").count().collect()
    extract_wall = None
    n_turns = []
    walls_h: list[float] = []
    for _ in range(4):  # best-of-4: the box is multi-tenant (BENCH/BASELINE.md;
        # single-shot loadavg swings have produced 3-6x outliers)
        t0 = time.time()
        n_turns = extract_turns(tr).select(
            "status"
        ).groupBy("status").count().collect()
        w = time.time() - t0
        walls_h.append(round(w, 3))
        extract_wall = w if extract_wall is None or w < extract_wall else extract_wall
    while max(walls_h) > 1.5 * min(walls_h) and len(walls_h) < 6:
        # >1.5x spread means a load spike hit a pass — the headline is the
        # driver's KPI, so buy up to 3 more samples for a clean floor
        t0 = time.time()
        n_turns = extract_turns(tr).select(
            "status"
        ).groupBy("status").count().collect()
        w = time.time() - t0
        walls_h.append(round(w, 3))
        extract_wall = min(extract_wall, w)
    load_ctx["extract_walls"] = walls_h
    total_turns = sum(r["count"] for r in n_turns)
    tr.unpersist()
    timings["extract_pipeline"] = round(extract_wall, 3)

    qmap = entry.queries()
    bench_queries = [
        "extract_html_heading",
        "extract_pdfish_reading_order",
        "extract_vtt_dialogue",
        "extract_pdf",
        "doc_stats",
        "chunk_fixed_tokens",
        "dedup_exact",
        "dedup_minhash_lsh",
        "simhash",
        "embed_knn_of_zero",
        "ann_bucket_pairs",
        "media_features",
        "agg_pricing_summary",
        "window_order_rank",
        "broadcast_brand_revenue",
        "sessionize_events",
        "events_hourly",
        "events_rollup",
        "asof_join",
        "interval_join",
        "c4_line_clean",
        "curation_funnel",
        "export_vtt",
        "extract_template_kv",
        "scene_detect",
        "speaker_assign",
        "quality_lr_train",
        "extract_doctags",
        "ocr_dedup_rects",
        # round-3 surface
        "pdf_hyperlinks",
        "picture_annotations",
        "hybrid_chunks",
        "lsh_bucket_overflow",
        "gopher_quality",
        "url_normalize",
        "conversation_stats",
        "script_profile",
        "readability",
        # round-4 surface
        "embed_cosine_pairs",
        "simhash_near_pairs",
        "ccnet_buckets",
        "bloom_dedup_check",
        # round-5 surface
        "lm_vocab_overflow",
        "debug_svg_pages",
    ]
    for name in bench_queries:
        # drop caches persisted by the PREVIOUS query (several queries
        # persist() shingle/candidate frames and cannot unpersist them —
        # the frames must stay live until execution); without this the
        # leaked blocks accumulate across the suite and compete with the
        # current query's own working set. Within one query's slot the
        # cache persists across warm-up + timed passes (steady state).
        spark.catalog.clearCache()
        # untimed warm-up first: the first execution of a query pays
        # one-off costs that aren't the operator (python-worker imports
        # of its engine module across all workers, shuffle-service
        # spin-up) — r1→r2 bench showed a 7x first-run artifact on the
        # first vtt-engine query; steady state was 0.9 s
        qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(2):  # best-of-2 per query (neighbor-load noise)
            t0 = time.time()
            df = qmap[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        while (max(walls) > 1.5 * min(walls) or min(walls) > 3.0) \
                and len(walls) < 4:
            # extra samples when a pass spread says a load spike hit, OR
            # when even the best pass is slow — a periodic neighbor burst
            # can hit BOTH initial passes of one query's slot (observed:
            # doc_stats 3.8 s twice in one run, 0.8 s isolated/replicated)
            t0 = time.time()
            qmap[name](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            walls.append(time.time() - t0)
        timings[name] = round(min(walls), 3)

    total = round(sum(timings.values()), 3)
    ticks1 = _cpu_ticks()
    d_busy = ticks1[0] - ticks0[0]
    d_idle = ticks1[1] - ticks0[1]
    d_steal = ticks1[2] - ticks0[2]
    d_tot = max(d_busy + d_idle, 1)
    # canary-normalized headline: what a reference-speed box (canary =
    # 1.0 Mops, the middle of this box's quiet band) would have shown.
    # Walls scale ~inversely with per-core speed, so wall × canary and
    # throughput ÷ canary. The raw value stays the primary metric; the
    # normalized twin makes cross-round drift self-adjudicating — a real
    # regression moves BOTH, a slow window moves only the raw one.
    canary_end = _cpu_canary()
    canary_mid = (canary0 + canary_end) / 2
    load_ctx.update({
        "loadavg_end": _loadavg(),
        "cpu_canary_mops_end": canary_end,
        # whole-box CPU accounting across the run: non-idle share includes
        # every tenant, so (busy - our own work) exposes neighbor load;
        # steal is host-level overcommit the guest can't control
        "cpu_busy_frac": round(d_busy / d_tot, 4),
        "cpu_steal_frac": round(d_steal / d_tot, 4),
    })
    print(json.dumps({
        "metric": "extraction+operator suite wall clock",
        "value": total,
        "unit": "sec",
        "value_canary_norm": round(total * canary_mid, 3),
        "queries": timings,
        "sf": sf,
        "extract_turns": total_turns,
        "extract_turns_per_s": round(total_turns / extract_wall, 1),
        "extract_turns_per_s_canary_norm": round(
            total_turns / extract_wall / max(canary_mid, 1e-9), 1),
        "canary_ref_mops": 1.0,
        "cpus": CPUS,
        "load_context": load_ctx,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
