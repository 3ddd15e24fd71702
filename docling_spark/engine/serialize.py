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


def serialize_docling_json(items: list[dict], name: str = "document") -> str:
    """Flat item list → DoclingDocument-shaped JSON (the reference's
    lossless export, its primary groundtruth format —
    tests/groundtruth_paths.py). Round-trips through
    engine/jsonx.py.extract_docling_json: deserializing the output and
    re-serializing to markdown reproduces serialize_items' text
    (tests/test_serialize.py::test_docling_json_roundtrip).

    Mapping: text-bearing labels → ``texts``; list/inline/section groups →
    ``groups``; tables (md-grid text re-parsed into TableData cells) →
    ``tables``; pictures → ``pictures``. ``$ref`` wiring mirrors the
    reference schema so the reference's own json backend can read it too.
    """
    import json as _json

    texts: list[dict] = []
    groups: list[dict] = []
    tables: list[dict] = []
    pictures: list[dict] = []
    ref_of: dict[int, str] = {0: "#/body"}

    group_labels = {"list": "list", "inline": "inline", "section": "section"}

    def bucket_for(it: dict) -> tuple[list, str, str]:
        label = it["label"]
        if label == "table":
            return tables, "tables", "table"
        if label == "picture":
            return pictures, "pictures", "picture"
        if label in group_labels:
            return groups, "groups", label
        return texts, "texts", label

    # assign refs in item order so parents always precede children
    skipped = {
        it["item_idx"] for it in items[1:] if it.get("_table_caption")
    }  # table captions render nowhere in md; keep export/import symmetric
    items_out = [it for it in items[1:] if it["item_idx"] not in skipped]
    for it in items_out:
        arr, kind, _label = bucket_for(it)
        ref_of[it["item_idx"]] = f"#/{kind}/{len(arr)}"
        arr.append({})  # placeholder; filled next pass

    by_parent: dict[int, list[dict]] = {}
    for it in items_out:
        by_parent.setdefault(it["parent_idx"], []).append(it)

    def node_for(it: dict) -> dict:
        arr, kind, label = bucket_for(it)
        node = {
            "self_ref": ref_of[it["item_idx"]],
            "parent": {"$ref": ref_of.get(it["parent_idx"], "#/body")},
            "children": [
                {"$ref": ref_of[ch["item_idx"]]}
                for ch in by_parent.get(it["item_idx"], [])
            ],
            "content_layer": it.get("content_layer", "body"),
            "label": label,
            "prov": [],
        }
        if kind == "texts":
            node["orig"] = it.get("text", "")
            node["text"] = it.get("text", "")
            # our flat items hold RENDERED markdown (escapes, backticks,
            # link syntax baked in); flag it so the deserializer does not
            # escape a second time. Reference-produced JSON (raw text per
            # inline element) lacks the flag and takes the escaping path.
            node["md_rendered"] = True
            if label == "section_header":
                node["level"] = max(1, int(it.get("_hlevel", 2)) - 1)
            if label == "code" and it.get("code_language"):
                node["code_language"] = it["code_language"]
            if label == "list_item":
                node["enumerated"] = False
                node["marker"] = "-"
        elif kind == "groups":
            if label == "list":
                ordered = it.get("text") == "ordered list"
                start = it.get("_start")
                node["name"] = (
                    f"ordered list start {start}"
                    if ordered and start and start != 1
                    else ("ordered list" if ordered else "list")
                )
                node["label"] = "list"
            else:
                node["name"] = "group"
        elif kind == "tables":
            node["data"] = _md_grid_to_tabledata(it.get("text", ""))
            node["captions"] = []
        elif kind == "pictures":
            node["captions"] = []
        return node

    for it in items_out:
        arr, kind, _label = bucket_for(it)
        idx = int(ref_of[it["item_idx"]].rsplit("/", 1)[1])
        arr[idx] = node_for(it)

    doc = {
        "schema_name": "DoclingDocument",
        "version": "1.7.0",
        "name": name,
        "furniture": {
            "self_ref": "#/furniture", "children": [],
            "content_layer": "furniture", "name": "_root_",
            "label": "unspecified",
        },
        "body": {
            "self_ref": "#/body",
            "children": [
                {"$ref": ref_of[ch["item_idx"]]} for ch in by_parent.get(0, [])
            ],
            "content_layer": "body", "name": "_root_",
            "label": "unspecified",
        },
        "groups": groups,
        "texts": texts,
        "pictures": pictures,
        "tables": tables,
        "key_value_items": [],
        "form_items": [],
        "pages": {},
    }
    return _json.dumps(doc, ensure_ascii=False)


def _md_grid_to_tabledata(md_table: str) -> dict:
    """Markdown grid (the table item's text) → TableData dict."""
    rows = [
        [c.strip() for c in line.strip().strip("|").split("|")]
        for line in md_table.splitlines()
        if line.strip()
    ]
    body = [r for r in rows if not all(set(c) <= {"-", " ", ""} for c in r)]
    has_header = len(body) < len(rows)
    ncols = max((len(r) for r in body), default=0)
    cells = []
    grid = []
    for ri, row in enumerate(body):
        grow = []
        for ci in range(ncols):
            text = row[ci] if ci < len(row) else ""
            cell = {
                "row_span": 1, "col_span": 1,
                "start_row_offset_idx": ri, "end_row_offset_idx": ri + 1,
                "start_col_offset_idx": ci, "end_col_offset_idx": ci + 1,
                "text": text.replace("&#124;", "|"),
                "column_header": bool(has_header and ri == 0),
                "row_header": False, "row_section": False, "fillable": False,
            }
            cells.append(cell)
            grow.append(cell)
        grid.append(grow)
    return {
        "table_cells": cells, "num_rows": len(body), "num_cols": ncols,
        "orientation": "horizontal", "grid": grid,
    }
