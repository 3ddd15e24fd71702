"""Alternative export sinks over the flat item table: DocTags and the
indented item-tree dump (itxt).

Re-expressions of the reference's OutputFormat surface
(docling/datamodel/base_models.py:129-140 — md, doctags, itxt among them;
CLI export docling/cli/main.py:489-593). Grammar pinned by the reference's
own groundtruth corpus (tests/data/pdf/groundtruth/*.doctags.txt,
tests/data/*/groundtruth/*.itxt):

- ``<doctag>`` root; one item per line; lists open inline with their first
  ``<list_item>``, one item per line, closing tag on its own line;
- tables serialize as OTSL: ``<otsl><ched>h<nl><fcel>c<nl></otsl>``
  (``ched`` = column header cell, ``fcel`` = full cell, ``nl`` = row end);
- section headers carry their level (``section_header_level_1``).

Our items carry no bboxes for text-born formats, so ``<loc_*>`` tokens are
omitted (the reference omits provenance tokens when absent).

Pure Python over the flat item dicts; used engine-side (serialize at
extraction time) or as a Spark map over the exploded item table.
"""

from __future__ import annotations

_GROUP_LABELS = frozenset(["unspecified", "list", "inline", "group"])


def _children_map(items: list[dict]) -> dict[int, list[dict]]:
    by_parent: dict[int, list[dict]] = {}
    for it in items:
        if it["parent_idx"] >= 0:
            by_parent.setdefault(it["parent_idx"], []).append(it)
    return by_parent


def _otsl(md_table: str) -> str:
    """Markdown grid (the table item's text) → OTSL token sequence."""
    rows = [
        [c.strip() for c in line.strip().strip("|").split("|")]
        for line in md_table.splitlines()
        if line.strip()
    ]
    body = [r for r in rows if not all(set(c) <= {"-", " ", ""} for c in r)]
    has_header = len(body) < len(rows)  # an md separator row marks row 0 as header
    out = ["<otsl>"]
    for ri, row in enumerate(body):
        cell_tag = "<ched>" if (has_header and ri == 0) else "<fcel>"
        for c in row:
            out.append(cell_tag + c)
        out.append("<nl>")
    out.append("</otsl>")
    return "".join(out)


def serialize_doctags(items: list[dict]) -> str:
    """Flat item list (engine schema) → DocTags document string.

    Items are already in depth-first order with parent pointers forming a
    tree rooted at item 0; one recursive walk emits each item once.
    """
    by_parent = _children_map(items)
    lines: list[str] = []

    def inline(it: dict) -> str:
        """Nested-under-list-item serialization (single inline string)."""
        kids = "".join(inline(k) for k in by_parent.get(it["item_idx"], []))
        label = it["label"]
        if label == "list":
            tag = "ordered_list" if it["text"] == "ordered list" else "unordered_list"
            return f"<{tag}>{kids}</{tag}>"
        if label == "list_item":
            return f"<list_item>{it['text']}{kids}</list_item>"
        if label == "table":
            return _otsl(it["text"]) + kids
        return f"<{label}>{it['text']}</{label}>" + kids

    def walk(it: dict) -> None:
        label = it["label"]
        kids = by_parent.get(it["item_idx"], [])
        if label == "list":
            tag = "ordered_list" if it["text"] == "ordered list" else "unordered_list"
            parts = [inline(k) for k in kids]
            if parts:
                lines.append(f"<{tag}>" + parts[0])
                lines.extend(parts[1:])
                lines.append(f"</{tag}>")
            return
        if label == "table":
            lines.append(_otsl(it["text"]))
        elif label == "section_header":
            lines.append(
                f"<section_header_level_1>{it['text']}</section_header_level_1>"
            )
        elif label in _GROUP_LABELS:
            pass  # structural group: children emit at top level
        else:
            lines.append(f"<{label}>{it['text']}</{label}>")
        for k in kids:
            walk(k)

    for it in by_parent.get(0, []):
        walk(it)
    return "<doctag>" + "\n".join(lines) + "\n</doctag>"


def serialize_itxt(items: list[dict]) -> str:
    """Flat item list → the reference's indented item-tree dump
    (tests/data/*/groundtruth/*.itxt shape)."""
    out = []
    for it in items:
        ind = "  " * it["level"]
        if it["label"] in _GROUP_LABELS:
            out.append(
                f'{ind}item-{it["item_idx"]} at level {it["level"]}: '
                f'{it["label"]}: group {it["text"]}'
            )
        else:
            out.append(
                f'{ind}item-{it["item_idx"]} at level {it["level"]}: '
                f'{it["label"]}: {it["text"]}'
            )
    return "\n".join(out)
