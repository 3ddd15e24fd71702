"""HybridChunker-semantics chunking: heading-path stack, token-budget
peer merge (sequential greedy), oversize plain-text split, and
contextualization (docling-core HybridChunker as used by
docling/cli/main.py:594-622; tokenizer = this repo's deterministic
whitespace splitter — see hybrid_chunks docstring for the derivability
note)."""

from __future__ import annotations

import pytest

from docling_spark.operators.chunker import hybrid_chunks


def _items(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, item_idx int, label string, level int, text string, "
        "content_layer string",
    )


def _chunks(df):
    return sorted(df.collect(), key=lambda r: (r.doc_id, r.chunk_idx))


def test_merge_peers_respects_budget(spark):
    items = _items(spark, [
        (1, 0, "section_header", 1, "Head one", "body"),   # 2 tokens
        (1, 1, "text", None, "a b c", "body"),
        (1, 2, "text", None, "d e f", "body"),
        (1, 3, "text", None, "g h i", "body"),
    ])
    # max 10: head(2) + 3 + 3 = 8 fits, + 3 more = 11 > 10 → split
    got = _chunks(hybrid_chunks(items, max_tokens=10))
    assert [(r.chunk_text, r.n_tokens) for r in got] == [
        ("a b c\nd e f", 8), ("g h i", 5)]
    assert got[0].headings == ["Head one"]
    assert got[0].contextualized == "Head one\na b c\nd e f"


def test_heading_stack_pops_same_or_deeper(spark):
    items = _items(spark, [
        (1, 0, "title", 1, "Doc", "body"),
        (1, 1, "section_header", 2, "One", "body"),
        (1, 2, "text", None, "p1", "body"),
        (1, 3, "section_header", 3, "Sub", "body"),
        (1, 4, "text", None, "p2", "body"),
        (1, 5, "section_header", 2, "Two", "body"),  # pops Sub AND One
        (1, 6, "text", None, "p3", "body"),
    ])
    got = _chunks(hybrid_chunks(items, max_tokens=50))
    assert [r.headings for r in got] == [
        ["Doc", "One"], ["Doc", "One", "Sub"], ["Doc", "Two"]]
    # different heading paths never merge
    assert [r.chunk_text for r in got] == ["p1", "p2", "p3"]


def test_oversize_item_splits_into_windows(spark):
    long = " ".join(f"t{i}" for i in range(20))
    items = _items(spark, [
        (1, 0, "section_header", 1, "H", "body"),  # 1 token → avail 7
        (1, 1, "text", None, long, "body"),
    ])
    got = _chunks(hybrid_chunks(items, max_tokens=8))
    texts = [r.chunk_text for r in got]
    assert len(texts) == 3  # 7 + 7 + 6
    assert texts[0].split() == [f"t{i}" for i in range(7)]
    assert texts[2].split() == [f"t{i}" for i in range(14, 20)]
    assert " ".join(" ".join(texts).split()) == long
    # split windows never re-merge (each full window saturates the budget)
    assert [r.n_tokens for r in got] == [8, 8, 7]


def test_merge_peers_false_keeps_one_chunk_per_item(spark):
    items = _items(spark, [
        (1, 0, "text", None, "a b", "body"),
        (1, 1, "text", None, "c d", "body"),
    ])
    got = _chunks(hybrid_chunks(items, max_tokens=50, merge_peers=False))
    assert [r.chunk_text for r in got] == ["a b", "c d"]
    # no heading: contextualized == chunk_text, headings empty
    assert got[0].headings == [] and got[0].contextualized == "a b"


def test_furniture_and_empty_items_ignored(spark):
    items = _items(spark, [
        (1, 0, "section_header", 1, "H", "body"),
        (1, 1, "text", None, "keep me", "body"),
        (1, 2, "text", None, "page 3", "furniture"),
        (1, 3, "text", None, "   ", "body"),
        (1, 4, "picture", None, "img", "body"),
    ])
    got = _chunks(hybrid_chunks(items, max_tokens=50))
    assert [r.chunk_text for r in got] == ["keep me"]


def test_max_tokens_guard(spark):
    items = _items(spark, [(1, 0, "text", None, "a", "body")])
    with pytest.raises(ValueError):
        hybrid_chunks(items, max_tokens=1)
