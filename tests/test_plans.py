"""Physical-plan assertions: the scale-critical plan properties claimed in
README's plan audit, enforced as regressions — column pruning through
mapInPandas, filter pushdown to the parquet scan, broadcast + partial
aggregation, and no pair-enumeration joins in the LSH path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF), reason="driver testdata not present"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


from tests.planutils import formatted_plan as _formatted  # noqa: E402


def test_extraction_prunes_scan_columns(spark):
    from docling_spark.operators.extract_ops import extract_turns

    tr = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "cast(doc_id as string) conv_id", "0 as turn_idx", "'u' as role",
        "cast(null as timestamp) ts", "text", "'html' as tool",
        "lang", "source",
    )
    plan = _formatted(spark, extract_turns(tr).select("status"))
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "doc_id" in scan and "text" in scan
    assert "lang" not in scan and "source" not in scan


def test_docstats_filter_pushdown(spark):
    from docling_spark.operators.textstats import doc_stats

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _formatted(spark, doc_stats(d.filter(F.col("doc_id") < 100)))
    assert "PushedFilters" in plan
    assert "LessThan(doc_id,100)" in plan
    # no shuffle anywhere in the statistics block
    assert "Exchange" not in plan


def test_broadcast_join_with_partial_agg(spark):
    import __spark_entry__ as entry

    plan = _plan(entry.q_broadcast_brand_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan


def test_lsh_path_has_no_cartesian(spark):
    import __spark_entry__ as entry

    plan = _plan(entry.q_dedup_minhash_lsh(spark, SF))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan  # candidate-confined shingle streams


def test_extraction_operator_adds_no_shuffle(spark):
    from docling_spark.operators.extract_ops import extract_turns

    tr = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "cast(doc_id as string) conv_id", "0 as turn_idx", "'u' as role",
        "cast(null as timestamp) ts", "text", "'' as tool",
    )
    plan = _plan(extract_turns(tr))
    assert "Exchange" not in plan


def test_curation_funnel_single_shuffle(spark):
    """The curation funnel shuffles exactly once (fingerprint hash for
    the dedup window) — no self-join, no global window."""
    from docling_spark.operators.textstats import curation_funnel

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _formatted(spark, curation_funnel(d))
    assert plan.count("hashpartitioning(") == 1
    assert "hashpartitioning(fingerprint" in plan
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" \
        not in plan


def test_containment_join_is_equi_join(spark):
    """The spatial containment join hash-joins on the doc key only —
    no nested-loop pair enumeration."""
    import __spark_entry__ as entry

    plan = _formatted(spark, entry.q_picture_cell_join(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_caption_attach_is_equi_join(spark):
    """Caption/footnote attachment hash-joins on (doc, page) only —
    no nested-loop pair enumeration."""
    import __spark_entry__ as entry

    plan = _formatted(spark, entry.q_caption_attach(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_no_global_window(spark):
    """Sequence packing must window on the shard key, never a
    single-partition global order (the vocab_topk r1 lesson)."""
    from docling_spark.operators.curation import pack_sequences

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _formatted(spark, pack_sequences(d, 512, 16))
    # every Exchange is a hash partitioning — no SinglePartition anywhere
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard" in plan


def test_tfidf_ranks_per_document(spark):
    """TF-IDF ranking windows partition by document; the tiny doc-count
    side is broadcast, and nothing nested-loops."""
    from docling_spark.operators.textstats import tfidf_topk

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _formatted(spark, tfidf_topk(d, k=3))
    assert "hashpartitioning(doc_id" in plan
    assert "CartesianProduct" not in plan
    # the 1-row doc-count side arrives by broadcast
    assert "BroadcastExchange" in plan


def test_bigram_lm_plan_shape(spark):
    """Bigram pairing is a doc-partitioned lead window (never a
    self-join); top-k is TakeOrderedAndProject (never a global sort of
    the whole bigram table); the unigram side broadcasts."""
    from docling_spark.operators.textstats import bigram_lm

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _formatted(spark, bigram_lm(d, k=30))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning(doc" in plan
    assert "BroadcastHashJoin" in plan


def test_bm25_filters_before_shuffle(spark):
    """The query-term filter lands below the (doc, term) aggregation so
    only matching tokens shuffle; the df and scalar-stats sides broadcast;
    nothing nested-loops over the corpus pairwise."""
    from docling_spark.operators.textstats import bm25_scores

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _formatted(spark, bm25_scores(d, ["spark", "join"]))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    # formatted explain prints each node in the tree AND the detail list,
    # so the single 1-row stats attach appears at most twice
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_c4_line_clean_no_shuffle(spark):
    """C4 cleaning is pure per-row array work — the plan must contain no
    exchange at all (line + page filters both row-local)."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_c4_line_clean(spark, SF))
    # the guarded test-corpus fan-out (entry._fan_out) adds one
    # round-robin exchange at bench scale; the operator itself must add
    # no data-dependent shuffle (no hash/single-partition exchange)
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_events_rollup_single_expand_shuffle(spark):
    """ROLLUP plans as one Expand feeding one partial/final aggregate —
    exactly one shuffle for all three grouping levels."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_events_rollup(spark, SF))
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan or "partial" in plan


def test_asof_join_contract_plan(spark):
    """The as-of contract query keeps the no-join shape end-to-end."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_asof_join(spark, SF))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
