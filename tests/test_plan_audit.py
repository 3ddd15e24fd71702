"""Whole-contract physical-plan audit: every ``queries()`` entry is planned
(not executed) at sf0.001 and screened for the scale-killers —
``CartesianProduct`` anywhere, and ``BroadcastNestedLoopJoin`` outside an
explicit allowlist of scalar/codebook attaches where the broadcast side is
O(1) rows by construction (a corpus total, a query vector, an IVF
codebook). This generalizes the per-query assertions in test_plans.py to
the full surface so a new query can't quietly ship an n² join.
"""

from __future__ import annotations

import pathlib

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

# BNLJ is the expected physical form of crossJoin(broadcast(<tiny>)):
# these queries attach a single-row aggregate / fixed query vector /
# bounded codebook to every row. The broadcast side cannot grow with the
# corpus, so the "nested loop" is one pass over the left side.
BNLJ_SCALAR_ATTACH = {
    "unigram_logprob",    # corpus token total (1 row)
    "tfidf_topk",         # corpus doc count (1 row)
    "bm25_scores",        # corpus (N, avgdl) stats (1 row)
    "dsir_weights",       # source/target distribution totals (1 row each)
    "diversity_sample",   # cluster-size total (1 row)
    "embed_knn_of_zero",  # the fixed query vector (1 row)
    "quantized_knn",      # the fixed query CODE vector (1 row)
    "ann_topk_batch",     # broadcast hyperplane set (fixed, tiny)
    "ivf_assign",         # IVF codebook (k centroids, k fixed)
    "semantic_dedup",     # codebook attach, same shape as ivf_assign
    "mixture_plan",       # global max-feasible-corpus min (1 row)
    "temperature_mixture",  # Z normalizer + corpus min (1 row each)
    "kmeans_codebook",    # codebook attach per Lloyd iteration (k rows)
    "line_perplexity",    # corpus (n_total, vocab) LM stats (1 row)
    "ccnet_buckets",      # LM stats + tercile cutoffs (1 row each)
    "lm_vocab_overflow",  # vocab totals + kept-top-V stats (1 row each)
}

pytestmark = pytest.mark.skipif(
    not pathlib.Path(SF_DIR).exists(), reason="testdata not available"
)


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_no_scale_killers_in_plan(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_SCALAR_ATTACH, (
            f"{name}: BroadcastNestedLoopJoin outside the scalar-attach "
            f"allowlist — broadcast-join a key or gate by LSH buckets "
            f"instead")
        # even allowlisted attaches must be broadcast, never a shuffled
        # nested loop
        assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan \
            or "BroadcastNestedLoopJoin BuildLeft, Cross" in plan, name
    # the r1 vocab_topk bug class: a Window whose child is
    # Exchange SinglePartition funnels the whole table through one task.
    # (A global agg's SinglePartition exchange is fine — only partial
    # rows flow — but a Window materializes every input row in one
    # partition.) No query ships one; keep it that way.
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Window " in ln or ln.strip().startswith("Window"):
            for j in range(i + 1, min(i + 3, len(lines))):
                assert "Exchange SinglePartition" not in lines[j], (
                    f"{name}: Window over Exchange SinglePartition — "
                    f"use orderBy().limit(k) / keyed windows instead")
