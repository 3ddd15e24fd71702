"""Differential oracle for the merged prune/br-sentinel walk.

``HtmlExtractor._prune`` folds three formerly-separate passes (skip-tag /
hidden prune, <br> → sentinel, sentinel-char strip) into one tree walk.
This test reconstructs the original two-pass flow — the pre-merge prune
body plus the kept ``_replace_br`` — and asserts identical item output
over the reference HTML corpus, the synthetic bench corpus's HTML turns,
and adversarial payloads.
"""

from __future__ import annotations

import pathlib

import pytest

from docling_spark.engine.htmlx import (
    BR_SENTINEL,
    SKIP_TAGS,
    Element,
    HtmlExtractor,
    parse_html,
)

HTML_SRC = pathlib.Path("/root/reference/tests/data/html/sources")


def _old_prune(root: Element) -> None:
    """The pre-merge prune pass: skip/hidden drop only (no br handling)."""
    stack = [root]
    while stack:
        node = stack.pop()
        kept = []
        for ch in node.children:
            if ch.__class__ is Element:
                attrs = ch.attrs
                if attrs:
                    if ch.tag in SKIP_TAGS or "hidden" in attrs:
                        continue
                    style = attrs.get("style")
                    if style and "display:none" in \
                            style.replace(" ", "").lower():
                        continue
                elif ch.tag in SKIP_TAGS:
                    continue
                stack.append(ch)
            kept.append(ch)
        node.children = kept


def _tree_signature(node: Element) -> tuple:
    if isinstance(node, str):
        return ("#text", node)
    return (node.tag, dict(node.attrs),
            tuple(_tree_signature(c) for c in node.children))


def _payloads():
    cases = [
        "<p>a<br>b</p>",
        "<p>a<br><br>b</p>",
        f"<div>pre{BR_SENTINEL}mixed</div><p>x<br/>y</p>",
        "<div style='display: none'><br>hidden</div><p>kept<br>here</p>",
        "<script>var x = '<br>';</script><p>t<br>u</p>",
        "<table><tr><td>a<br>b</td></tr></table>",
        "<ul><li>one<br>two<li>three</ul>",
        "<br>",
        "<body><br class='x'>tail</body>",
        "<div hidden><p>gone<br>gone</p></div><span>s</span>",
    ]
    if HTML_SRC.exists():
        for f in sorted(HTML_SRC.glob("*.html")):
            cases.append(f.read_text(errors="replace"))
    try:
        from docling_spark.sources.transcripts import gen_conversation

        for c in range(120):
            for r in gen_conversation(c):
                if r["tool"] == "html":
                    cases.append(r["text"])
    except Exception:
        pass
    return cases


def test_merged_prune_matches_two_pass_flow() -> None:
    mism = []
    for i, payload in enumerate(_payloads()):
        merged = parse_html(payload)
        HtmlExtractor._prune(merged)

        twopass = parse_html(payload)
        _old_prune(twopass)
        # the old flow ran _replace_br on <body> only; br handling outside
        # body is invisible to the item walker (items start at body), so
        # the differential compares the body subtree both flows agree on
        HtmlExtractor._replace_br(twopass)

        if _tree_signature(merged) != _tree_signature(twopass):
            mism.append(i)
    assert not mism, f"merged prune diverged on payload indices {mism}"


def test_item_output_invariants_via_extract() -> None:
    """End-to-end smoke over the corpus: full extract() returns items
    whose parent indices are well-formed. The actual merged-vs-two-pass
    differential is test_merged_prune_matches_two_pass_flow above — the
    walker is a pure function of the pruned tree, so tree-signature
    equality there implies item equality here."""
    ex = HtmlExtractor()
    for payload in _payloads()[:40]:
        items = ex.extract(payload)
        assert isinstance(items, list)
        for it in items[1:]:
            assert 0 <= it["parent_idx"] < it["item_idx"]
