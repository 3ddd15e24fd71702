"""Round-2 regression tests: VERDICT "What's wrong" + ADVICE fixes.

Each test pins one of the r1 findings:
- fixed_token_chunks no longer drops docs with 0 < n_tokens <= overlap
- budget_chunks keys sections by heading item_idx, not heading text
- connected_components converges on long chains (pointer jumping) and
  raises on genuine non-convergence
- cosine_pairs_lsh (the new contract plan) against the exact n² oracle
- emailx raw-payload body fallback
- export_items derives keep-column types from the input schema
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- chunker

def test_short_doc_survives_overlap(spark):
    from docling_spark.operators.chunker import fixed_token_chunks

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y"), (3, "")],
        "doc_id long, text string",
    )
    out = fixed_token_chunks(docs, chunk_tokens=16, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 8-token doc used to vanish (n - overlap <= 0 → zero chunks)
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "a b c d e f g h"
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "x y"
    assert 3 not in by_doc  # empty doc still yields nothing


def test_fixed_chunks_overlap_windows(spark):
    from docling_spark.operators.chunker import fixed_token_chunks

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], "doc_id long, text string"
    )
    rows = sorted(
        fixed_token_chunks(docs, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_text for r in rows] == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9",
    ]


def test_budget_chunks_duplicate_headings_pack_independently(spark):
    from docling_spark.operators.chunker import budget_chunks

    # two sections whose headings read identically; text-keyed grouping
    # used to interleave their items into shared bins
    items = spark.createDataFrame(
        [
            (1, 0, "section_header", "Intro", "body"),
            (1, 1, "text", "a1 a2 a3", "body"),
            (1, 2, "text", "a4 a5 a6", "body"),
            (1, 3, "section_header", "Intro", "body"),
            (1, 4, "text", "b1 b2 b3", "body"),
            (1, 5, "text", "b4 b5 b6", "body"),
        ],
        "doc_id long, item_idx int, label string, text string, content_layer string",
    )
    rows = budget_chunks(items, max_tokens=6).collect()
    got = {(r.heading_idx, r.chunk_id): r.chunk_text for r in rows}
    assert got == {
        (0, 0): "a1 a2 a3 a4 a5 a6",
        (3, 0): "b1 b2 b3 b4 b5 b6",
    }


# ------------------------------------------------- connected components

def test_connected_components_long_chain_converges(spark):
    from docling_spark.operators.dedup import connected_components

    # a 120-node chain: min-label alone needs ~120 rounds; pointer
    # jumping must land it well inside max_iter=10
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "doc_a long, doc_b long"
    )
    labels = connected_components(pairs, max_iter=10).collect()
    assert len(labels) == 121
    assert {r.component for r in labels} == {0}


def test_connected_components_strict_raises(spark):
    from docling_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iter=2, strict=True)
    # non-strict path still returns labels (possibly split)
    out = connected_components(pairs, max_iter=2, strict=False).collect()
    assert len(out) == 41


def test_connected_components_two_clusters(spark):
    from docling_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.component
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


# ------------------------------------------------------- similarity LSH

def test_cosine_pairs_lsh_subset_and_recall(spark, sf_dir):
    """The LSH-gated plan returns a SUBSET of the exact n² pairs with
    identical scores, and decent recall at the contract threshold."""
    from docling_spark.operators.similarity import cosine_pairs, cosine_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cos
        for r in cosine_pairs(emb, threshold=0.45).collect()
    }
    gated = {
        (r.id_a, r.id_b): r.cos
        for r in cosine_pairs_lsh(emb, threshold=0.45, dim=64).collect()
    }
    assert set(gated) <= set(exact)
    for k, v in gated.items():
        assert v == exact[k]
    if exact:
        recall = len(gated) / len(exact)
        assert recall >= 0.4, f"recall {recall:.2f} below floor"


def test_cosine_pairs_lsh_no_nested_loop_join(spark, sf_dir):
    from docling_spark.operators.similarity import cosine_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = cosine_pairs_lsh(emb, threshold=0.45, dim=64)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ----------------------------------------------------------- email/export

def test_email_raw_body_fallback(spark):
    from docling_spark.engine.emailx import extract_email

    raw = (
        "From: a@example.com\r\n"
        "To: b@example.com\r\n"
        "Subject: odd type\r\n"
        "Content-Type: application/x-custom\r\n"
        "\r\n"
        "first paragraph body\r\n\r\nsecond paragraph\r\n"
    )
    md, items, _metrics = extract_email(raw)
    assert "first paragraph body" in md
    assert "second paragraph" in md


def test_export_items_string_keep_cols(spark):
    from docling_spark.operators.export import export_items
    from docling_spark.operators.extract_ops import extract_turns

    d = spark.createDataFrame(
        [("c1", 0, "user", None, "<html><body><p>hi</p></body></html>", "html")],
        "conv_id string, turn_idx int, role string, ts timestamp, "
        "text string, tool string",
    )
    out = export_items(
        extract_turns(d), fmt="doctags", keep_cols=("conv_id", "role")
    ).collect()
    # role is a string col — the old name-based heuristic typed it int and
    # crashed in Arrow; schema-derived typing keeps it
    assert out[0].role == "user" and out[0].conv_id == "c1"
    assert "<doctag>" in out[0].doctags or out[0].doctags


# ------------------------------------------------------- assembly bound

def test_assemble_two_level_matches_single_level(spark):
    from docling_spark.operators.extract_ops import assemble_conversations

    rows = [("c%d" % (i % 3), i // 3, "t%03d" % i, "success") for i in range(60)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, extracted_text string, status string"
    )
    # tiny segment size forces multi-segment folding; result must equal
    # the naive order-joined text
    out = {r.conv_id: r for r in
           assemble_conversations(df, segment_size=4).collect()}
    for c in ("c0", "c1", "c2"):
        expect = "\n\n".join(
            t for (cv, _ti, t, _s) in sorted(rows, key=lambda x: x[1])
            if cv == c
        )
        assert out[c].conversation_text == expect
        assert out[c].n_turns == 20
        assert out[c].n_success == 20


def test_vocab_topk_no_global_window_exchange(spark):
    from docling_spark.operators.textstats import vocab_topk

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma alpha " + ("beta" if i % 2 else "delta"))
         for i in range(50)],
        "doc_id long, text string",
    )
    out = vocab_topk(docs, k=3)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.token for r in rows] == ["alpha", "beta", "gamma"]
    assert rows[0].n == 100
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the top-k must ride TakeOrderedAndProject, not a global sort of the
    # whole vocabulary into one partition
    assert "TakeOrderedAndProject" in plan
