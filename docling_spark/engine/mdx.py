"""Markdown payload → item table.

Re-expression of the reference Markdown backend (docling/backend/
md_backend.py:682-760 convert, 356-634 AST walk): headings, nested lists,
fenced code, pipe tables, blockquotes, paragraphs — and the reference's
embedded-raw-HTML delegation (md_backend.py:713-757): contiguous raw-HTML
blocks are routed through the HTML engine and their items spliced in.

Implemented as a deterministic line-based parser (marko is not available;
the grammar subset matches the reference's test corpus), emitting the same
flat item schema as the HTML engine, serialized by the same serializer so
markdown output is round-trip-normalized.
"""

from __future__ import annotations

import re

from docling_spark.engine.htmlx import (
    HtmlExtractor,
    Item,
    _mk_item,
    serialize_items,
)
from docling_spark.functions.textnorm import clean_unicode

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_ULIST_RE = re.compile(r"^(\s*)([-*+])\s+(.*)$")
_OLIST_RE = re.compile(r"^(\s*)(\d+)[.)]\s+(.*)$")
_FENCE_RE = re.compile(r"^(\s*)(```+|~~~+)\s*([\w+#.-]*)\s*$")
_TABLE_ROW_RE = re.compile(r"^\s*\|.*\|\s*$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?\s*:?-+:?\s*(\|\s*:?-+:?\s*)+\|?\s*$")
_HTML_BLOCK_RE = re.compile(r"^\s*<(!--|/?[a-zA-Z][^>]*>?)")
_UNDERSCORE_RUN_RE = re.compile(r"_{2,}")
_DASH_RUN_RE = re.compile(r"-{3,}")


def _inline(text: str) -> str:
    """Normalize inline markdown text (whitespace collapse + unicode table;
    md formatting markers pass through — the serializer re-emits them)."""
    return clean_unicode(" ".join(text.split()))


def extract_markdown(payload: str) -> tuple[str, list[Item], dict]:
    """payload → (extracted_text, items, metrics)."""
    # underscore/dash-run shortening (md_backend.py:102-150)
    payload = _UNDERSCORE_RUN_RE.sub("_", payload)

    items: list[Item] = []
    _mk_item(items, -1, "unspecified", 0, "_root_", "body")
    hstack: list[tuple[int, int]] = []  # (hashes, item_idx)

    def parent_for_block() -> int:
        return hstack[-1][1] if hstack else 0

    lines = payload.splitlines()
    i = 0
    n = len(lines)
    para_buf: list[str] = []
    saw_h1 = False
    n_html_blocks = 0

    def flush_para() -> None:
        if not para_buf:
            return
        text = _inline(" ".join(para_buf))
        para_buf.clear()
        if text:
            _mk_item(items, parent_for_block(), "text",
                     len(hstack) + 1, text, "body")

    def handle_heading(hashes: int, text: str) -> None:
        nonlocal saw_h1
        while hstack and hstack[-1][0] >= hashes:
            hstack.pop()
        parent = hstack[-1][1] if hstack else 0
        label = "title" if (hashes == 1 and not saw_h1) else "section_header"
        if hashes == 1:
            saw_h1 = True
        idx = _mk_item(items, parent, label, len(hstack) + 1, _inline(text), "body")
        items[idx]["_hlevel"] = hashes
        hstack.append((hashes, idx))

    def parse_list(start: int) -> int:
        """Parse a (possibly nested) list starting at line index ``start``;
        returns the first index past the list. Nesting by indentation."""
        group_stack: list[tuple[int, int, bool]] = []  # (indent, group_idx, ordered)
        last_item_idx: int | None = None
        j = start
        while j < n:
            line = lines[j]
            m = _ULIST_RE.match(line) or _OLIST_RE.match(line)
            if not m:
                if line.strip() == "":
                    # blank line inside a list only continues if next is a list line
                    k = j + 1
                    if k < n and (_ULIST_RE.match(lines[k]) or _OLIST_RE.match(lines[k])):
                        j += 1
                        continue
                    break
                # lazy continuation of the previous item
                if last_item_idx is not None and line.startswith(("    ", "\t")):
                    items[last_item_idx]["text"] = (
                        items[last_item_idx]["text"] + " " + _inline(line)
                    ).strip()
                    j += 1
                    continue
                break
            indent = len(m.group(1).replace("\t", "    "))
            ordered = m.group(2).isdigit()
            text = m.group(3)
            while group_stack and indent < group_stack[-1][0]:
                group_stack.pop()
            if not group_stack or indent > group_stack[-1][0]:
                parent = last_item_idx if group_stack and last_item_idx is not None \
                    else parent_for_block()
                gidx = _mk_item(
                    items, parent, "list", len(hstack) + 1,
                    "ordered list" if ordered else "list", "body",
                )
                if ordered:
                    items[gidx]["_start"] = int(m.group(2))
                group_stack.append((indent, gidx, ordered))
            elif group_stack[-1][2] != ordered:
                gidx = _mk_item(
                    items, items[group_stack[-1][1]]["parent_idx"], "list",
                    len(hstack) + 1, "ordered list" if ordered else "list", "body",
                )
                if ordered:
                    items[gidx]["_start"] = int(m.group(2))
                group_stack[-1] = (indent, gidx, ordered)
            gidx = group_stack[-1][1]
            last_item_idx = _mk_item(
                items, gidx, "list_item", len(hstack) + 2, _inline(text), "body"
            )
            j += 1
        return j

    while i < n:
        line = lines[i]
        fence = _FENCE_RE.match(line)
        if fence:
            flush_para()
            lang = fence.group(3)
            marker = fence.group(2)[:3]
            j = i + 1
            code_lines: list[str] = []
            while j < n and not lines[j].strip().startswith(marker):
                code_lines.append(lines[j])
                j += 1
            idx = _mk_item(items, parent_for_block(), "code", len(hstack) + 1,
                           "\n".join(code_lines).rstrip(), "body")
            items[idx]["code_language"] = lang or "unknown"
            i = j + 1
            continue
        m = _HEADING_RE.match(line)
        if m:
            flush_para()
            handle_heading(len(m.group(1)), m.group(2))
            i += 1
            continue
        if _ULIST_RE.match(line) or _OLIST_RE.match(line):
            flush_para()
            i = parse_list(i)
            continue
        if _TABLE_ROW_RE.match(line) and i + 1 < n and _TABLE_SEP_RE.match(lines[i + 1]):
            flush_para()
            rows: list[list[str]] = []
            j = i
            while j < n and _TABLE_ROW_RE.match(lines[j]):
                if not _TABLE_SEP_RE.match(lines[j]):
                    cells = [c.strip() for c in lines[j].strip().strip("|").split("|")]
                    rows.append([_inline(c) for c in cells])
                j += 1
            ncols = max(len(r) for r in rows)
            md_lines = []
            for ri, r in enumerate(rows):
                r = r + [""] * (ncols - len(r))
                md_lines.append("| " + " | ".join(r) + " |")
                if ri == 0:
                    md_lines.append("| " + " | ".join("-" for _ in range(ncols)) + " |")
            _mk_item(items, parent_for_block(), "table", len(hstack) + 1,
                     "\n".join(md_lines), "body")
            i = j
            continue
        if _HTML_BLOCK_RE.match(line) and line.lstrip().startswith("<"):
            # contiguous raw-HTML block → delegate to the HTML engine
            # (md_backend.py:713-757)
            flush_para()
            j = i
            html_lines: list[str] = []
            while j < n and lines[j].strip() != "":
                html_lines.append(lines[j])
                j += 1
            n_html_blocks += 1
            sub = HtmlExtractor().extract("\n".join(html_lines))
            base = len(items)
            parent = parent_for_block()
            for it in sub[1:]:  # skip sub-root
                new = dict(it)
                new["item_idx"] = len(items)
                new["parent_idx"] = (
                    parent if it["parent_idx"] == 0
                    else it["parent_idx"] + base - 1
                )
                items.append(Item(new))
            i = j
            continue
        if line.startswith(">"):
            flush_para()
            quote_lines = []
            j = i
            while j < n and lines[j].startswith(">"):
                quote_lines.append(lines[j].lstrip("> "))
                j += 1
            text = _inline(" ".join(quote_lines))
            if text:
                _mk_item(items, parent_for_block(), "text",
                         len(hstack) + 1, text, "body")
            i = j
            continue
        if _DASH_RUN_RE.fullmatch(line.strip()) or line.strip() in ("***", "___"):
            flush_para()
            i += 1
            continue
        if line.strip() == "":
            flush_para()
            i += 1
            continue
        para_buf.append(line)
        i += 1
    flush_para()

    text = serialize_items(items, layer="body")
    n_items = len(items) - 1
    metrics = {
        "pages_parsed": 1,
        "parse_score": 1.0,
        "boilerplate_ratio": 0.0,
        "n_items": n_items,
    }
    return text, items, metrics
