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

_GROUP_LABELS = frozenset(
    ["unspecified", "list", "inline", "group", "sheet", "chapter",
     "section"])


def _children_map(items: list[dict]) -> dict[int, list[dict]]:
    by_parent: dict[int, list[dict]] = {}
    for it in items:
        if it["parent_idx"] >= 0:
            by_parent.setdefault(it["parent_idx"], []).append(it)
    return by_parent


def _parse_md_grid(md_table: str) -> tuple[list[list[str]], bool]:
    """Shared markdown-grid parse for every table-consuming sink:
    (body rows, has_header). ONE rule for all formats — only the dash
    separator row drops (every cell non-empty and dashes-only); an
    ALL-EMPTY row is real data (the latex tabular trailing-row quirk
    must render identically in doctags/html/json), and the md pipe
    escape ``&#124;`` is undone here because no sink keeps md's pipe
    delimiter constraint."""
    rows = [
        [c.strip() for c in line.strip().strip("|").split("|")]
        for line in md_table.splitlines()
        if line.strip()
    ]

    def _is_sep(r):
        return bool(r) and all(c and set(c) <= {"-"} for c in r)

    # ONLY row index 1 can be the separator (markdown grammar): dropping
    # every all-dash row deleted real data rows whose cells were '-'
    has_header = len(rows) > 1 and _is_sep(rows[1])
    body = [
        [c.replace("&#124;", "|") for c in r]
        for ri, r in enumerate(rows)
        if not (ri == 1 and has_header)
    ]
    return body, has_header


def _otsl(md_table: str) -> str:
    """Markdown grid (the table item's text) → OTSL token sequence."""
    body, has_header = _parse_md_grid(md_table)
    out = ["<otsl>"]
    for ri, row in enumerate(body):
        cell_tag = "<ched>" if (has_header and ri == 0) else "<fcel>"
        for c in row:
            # the OTSL grammar's empty-cell token (reference groundtruth
            # vocabulary); our reader accepts both, the reference's only
            # emits <ecel> for empties
            out.append("<ecel>" if c == "" and cell_tag == "<fcel>"
                       else cell_tag + c)
        out.append("<nl>")
    out.append("</otsl>")
    return "".join(out)


def _is_ordered(group: dict, children: list[dict]) -> bool:
    """THE ordered-list rule (was three hand-rolled copies that had
    already drifted between equality and startswith): ordered when the
    group text says so, or when any child carries an explicit numeric
    marker (docbinx/pptbinx groups keep text='list' for itxt parity)."""
    if str(group.get("text", "")).startswith("ordered list"):
        return True
    return any(
        str(k.get("_marker", "")).endswith(".")
        and str(k.get("_marker", ""))[:-1].isdigit()
        for k in children
    )


def serialize_doctags(items: list[dict]) -> str:
    """Flat item list (engine schema) → DocTags document string.

    Items are already in depth-first order with parent pointers forming a
    tree rooted at item 0; one recursive walk emits each item once.
    """
    by_parent = _children_map(items)
    lines: list[str] = []

    def list_tag(it: dict) -> str:
        return ("ordered_list"
                if _is_ordered(it, by_parent.get(it["item_idx"], []))
                else "unordered_list")

    def inline(it: dict) -> str:
        """Nested-under-list-item serialization (single inline string)."""
        kids = "".join(inline(k) for k in by_parent.get(it["item_idx"], []))
        label = it["label"]
        if label == "list":
            tag = list_tag(it)
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
            tag = list_tag(it)
            parts = [inline(k) for k in kids]
            if parts:
                lines.append(f"<{tag}>" + parts[0])
                lines.extend(parts[1:])
                lines.append(f"</{tag}>")
            return
        if label == "table":
            lines.append(_otsl(it["text"]))
        elif label == "section_header":
            # level from _hlevel (mirrors serialize_docling_json; our
            # doctags reader maps level N back to _hlevel N+1) —
            # hardcoding level 1 flattened heading hierarchy on the
            # doctags round-trip
            lvl = max(1, int(it.get("_hlevel", 2)) - 1)
            lines.append(
                f"<section_header_level_{lvl}>{it['text']}"
                f"</section_header_level_{lvl}>"
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


def _itxt_text(text: str, max_text_len: int = 70) -> str:
    """The reference itxt dump truncates long text to
    ``head(max//2-3) + ' ... ' + tail(max - head)`` (latex groundtruth:
    70 → 32 head + 38 tail); a text whose length does not exceed the
    truncated form (max+5) stays whole (73-char list items survive)."""
    if len(text) <= max_text_len + 5:
        return text
    head = max_text_len // 2 - 3
    return text[:head] + " ... " + text[-(max_text_len - head):]


def serialize_itxt(items: list[dict]) -> str:
    """Flat item list → the reference's indented item-tree dump
    (tests/data/*/groundtruth/*.itxt shape; max_text_len=70,
    explicit_tables=False → tables print as 'table with [RxC]').

    Items print in TREE order with sequential numbers (a caption
    created mid-group but parented at body prints after the group);
    a bare picture prints with no text suffix, and its caption ref
    prints nested one level deeper sharing the picture's number
    (latex groundtruth corpus shape)."""
    by_parent: dict[int, list[dict]] = {}
    for it in items:
        by_parent.setdefault(it["parent_idx"], []).append(it)
    out: list[str] = []
    counter = 0

    def emit(it: dict) -> None:
        nonlocal counter
        n = counter
        counter += 1
        ind = "  " * it["level"]
        raw = it.get("_raw", it["text"])
        if it["label"] == "key_value_region":
            # KVP regions live in DoclingDocument.key_value_items, which
            # the reference itxt dump prints one extra level deep with
            # the text "ignored" (xbrl groundtruth itxt tail)
            out.append(
                f'{ind}  item-{n} at level {it["level"]}: '
                f'key_value_region: ignored'
            )
        elif it["label"] == "table" and "num_rows" in it:
            out.append(
                f'{ind}item-{n} at level {it["level"]}: '
                f'table with [{it["num_rows"]}x{it["num_cols"]}]'
            )
        elif it["label"] == "picture" and not raw:
            out.append(f'{ind}item-{n} at level {it["level"]}: picture')
            cap = it.get("_cap_ref")
            if cap is not None:
                cit = items[cap]
                out.append(
                    f'{ind}  item-{n} at level {it["level"] + 1}: '
                    f'caption: {_itxt_text(cit.get("_raw", cit["text"]))}'
                )
        elif it["label"] in _GROUP_LABELS:
            out.append(
                f'{ind}item-{n} at level {it["level"]}: '
                f'{it["label"]}: group {it["text"]}'
            )
        else:
            out.append(
                f'{ind}item-{n} at level {it["level"]}: '
                f'{it["label"]}: {_itxt_text(raw)}'
            )
        for ch in by_parent.get(it["item_idx"], []):
            emit(ch)

    for root in by_parent.get(-1, []):
        emit(root)
    return "\n".join(out)


import re as _re

_CODE_SPAN_RE = _re.compile(r"(`[^`]*`)")
_HREF_PAT = r"(?:[^()\s]|\([^()\s]*\))*"  # one balanced-paren level
_LTXT_PAT = r"(?:[^\[\]]|\[[^\[\]]*\])*"  # one balanced-bracket level
_MD_LINK_RE = _re.compile(r"(\[" + _LTXT_PAT + r"\]\(" + _HREF_PAT + r"\))")
_MD_LINK_PARTS = _re.compile(
    r"\[(" + _LTXT_PAT + r")\]\((" + _HREF_PAT + r")\)")


def _code_esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _html_text(md_text: str) -> str:
    """Item md text → HTML text content.

    Item texts store RENDERED markdown: ``&amp;``/``&lt;``/``&gt;`` are
    already valid HTML entities (kept); ``[text](href)`` links become
    real anchors and backtick spans real ``<code>`` elements (so
    re-extraction does not md-escape their interiors); the md underscore
    escape is undone (re-extraction re-applies it); newlines become
    ``<br/>`` (the single-<br> rule restores them). ``**`` emphasis
    markers pass through as literal text — markdown output round-trips
    even though run structure flattens.
    """

    def convert_spans(s: str) -> str:
        out = []
        for i, part in enumerate(_CODE_SPAN_RE.split(s)):
            if i % 2 == 1:
                out.append(f"<code>{_code_esc(part[1:-1])}</code>")
            else:
                out.append(part.replace("\\_", "_")
                           .replace("\n", "<br/>"))
        return "".join(out)

    out = []
    for i, part in enumerate(_MD_LINK_RE.split(md_text)):
        if i % 2 == 1:
            m = _MD_LINK_PARTS.match(part)
            href = (m.group(2).replace("&", "&amp;")
                    .replace('"', "&quot;"))
            out.append(f'<a href="{href}">'
                       f"{convert_spans(m.group(1))}</a>")
        else:
            out.append(convert_spans(part))
    return "".join(out)


def serialize_html(items: list[dict], layer: str = "body",
                   title: str = "document") -> str:
    """Flat item list → standalone HTML document (the reference's HTML
    export surface, docling/datamodel/base_models.py OutputFormat.HTML).

    Designed as the md serializer's structural twin: re-extracting the
    output with engine/htmlx.py and serializing to markdown reproduces
    serialize_items' text byte-exactly
    (tests/test_serialize.py::test_html_roundtrip). Tables re-parse the
    item's md grid; list groups emit <ul>/<ol start=N>; formulas emit
    their $$..$$ text inside a dedicated block."""
    by_parent = _children_map(items)
    out: list[str] = []

    def esc_cell(c: str) -> str:
        # cell text stores BLOCKS joined with two spaces (the rich-cell
        # md rule); re-emit each block as its own element so
        # re-extraction rebuilds the same join: image markers → <img/>,
        # fenced ``` code ``` → <pre>, other blocks → <p>
        # (&#124; already undone by _parse_md_grid)
        blocks = c.split("  ")
        if len(blocks) == 1 and "<!-- image -->" not in c:
            m = _re.fullmatch(r"``` (.*) ```", c)
            if m:
                return f"<pre>{_code_esc(m.group(1))}</pre>"
            return _html_text(c)
        parts = []
        for b in blocks:
            b = b.strip()
            if not b:
                continue
            if b == "<!-- image -->":
                parts.append("<img/>")
            elif b.startswith("``` ") and b.endswith(" ```"):
                parts.append(f"<pre>{_code_esc(b[4:-4])}</pre>")
            else:
                parts.append(f"<p>{_html_text(b)}</p>")
        return "".join(parts)

    def table_html(md_table: str) -> str:
        body, _has_header = _parse_md_grid(md_table)
        parts = ["<table>"]
        for row in body:
            parts.append("<tr>" + "".join(
                f"<td>{esc_cell(c)}</td>" for c in row) + "</tr>")
        parts.append("</table>")
        return "".join(parts)

    def heading_rank(it: dict) -> int:
        if it["label"] == "title":
            return 1
        return min(6, max(2, int(it.get("_hlevel", 2))))

    def list_html(group: dict) -> str:
        ordered = _is_ordered(group, by_parent.get(group["item_idx"], []))
        start = group.get("_start", 1)
        open_tag = "<ol>" if ordered and start in (1, None) else (
            f'<ol start="{start}">' if ordered else "<ul>")
        parts = [open_tag]
        for ch in by_parent.get(group["item_idx"], []):
            if ch["content_layer"] != layer:
                continue
            if ch["label"] == "list_item":
                inner = _html_text(ch["text"])
                for sub in by_parent.get(ch["item_idx"], []):
                    if sub["label"] == "list":
                        inner += list_html(sub)
                    elif sub["label"] == "picture":
                        inner += "<img/>"
                    elif sub["label"] == "caption":
                        inner += f"<p>{_html_text(sub['text'])}</p>"
                    elif sub["label"] == "table":
                        # a table nested in a list item must survive the
                        # export (doctags keeps it; dropping it broke
                        # the documented md round-trip)
                        if sub["text"]:
                            inner += table_html(sub["text"])
                    elif sub.get("text"):
                        inner += f"<p>{_html_text(sub['text'])}</p>"
                parts.append(f"<li>{inner}</li>")
            elif ch["label"] == "list":
                parts.append(list_html(ch))
            elif ch.get("text"):
                # non-list-item child of a list group (caption/text):
                # emit rather than silently drop
                parts.append(f"<p>{_html_text(ch['text'])}</p>")
            elif ch["label"] == "picture":
                parts.append("<li><img/></li>")
        parts.append("</ol>" if ordered else "</ul>")
        return "".join(parts)

    def walk(idx: int) -> None:
        for it in by_parent.get(idx, []):
            if it["content_layer"] != layer and \
                    it["label"] != "unspecified":
                walk(it["item_idx"])
                continue
            label = it["label"]
            if label in ("title", "section_header"):
                n = heading_rank(it)
                out.append(f"<h{n}>{_html_text(it['text'])}</h{n}>")
                walk(it["item_idx"])
            elif label == "text":
                out.append(f"<p>{_html_text(it['text'])}</p>")
                walk(it["item_idx"])
            elif label == "list":
                out.append(list_html(it))
            elif label == "code":
                code = (it["text"].replace("&", "&amp;")
                        .replace("<", "&lt;").replace(">", "&gt;"))
                out.append(f"<pre><code>{code}</code></pre>")
            elif label == "table":
                if it["text"]:
                    out.append(table_html(it["text"]))
            elif label == "caption":
                if not it.get("_table_caption"):
                    out.append(f"<p>{_html_text(it['text'])}</p>")
            elif label == "picture":
                out.append("<img/>")
                walk(it["item_idx"])  # glmx attaches children to pictures
            elif label == "formula":
                d = "$" if it.get("_inline") else "$$"
                # escape like the code branch: latex routinely contains
                # < > & ('$$a<b$$' would open a bold tag and swallow the
                # rest of the formula on re-extraction)
                ftxt = (it["text"].replace("&", "&amp;")
                        .replace("<", "&lt;").replace(">", "&gt;"))
                out.append(f"<p>{d}{ftxt}{d}</p>")
            elif label == "field_region":
                # re-emit the reference's form container markup
                # (html_backend.py:169-175 semantic ids) so re-extraction
                # rebuilds the identical field_region/field_item tree
                parts = ['<div class="form_region">']
                key_n = 0
                for fi in by_parent.get(it["item_idx"], []):
                    if fi["label"] != "field_item":
                        parts.append(f"<p>{_html_text(fi['text'])}</p>")
                        continue
                    key_n += 1
                    k = key_n
                    nv = 0
                    parts.append("<div>")
                    for part in by_parent.get(fi["item_idx"], []):
                        t = _html_text(part["text"])
                        if part["label"] == "marker":
                            parts.append(f'<div id="key{k}_marker">{t}</div>')
                        elif part["label"] == "field_key":
                            parts.append(f'<span id="key{k}">{t}</span>')
                        elif part["label"] == "field_value":
                            nv += 1
                            parts.append(
                                f'<span id="key{k}_value{nv}">{t}</span>')
                    parts.append("</div>")
                parts.append("</div>")
                out.append("".join(parts))
            elif label in _GROUP_LABELS:
                walk(it["item_idx"])
            else:
                if it["text"]:
                    out.append(f"<p>{_html_text(it['text'])}</p>")
                walk(it["item_idx"])

    walk(0)
    body = "\n".join(out)
    safe_title = (title.replace("&", "&amp;").replace("<", "&lt;")
                  .replace(">", "&gt;"))
    return ("<!DOCTYPE html>\n<html>\n<head><meta charset=\"utf-8\">"
            f"<title>{safe_title}</title></head>\n<body>\n{body}\n"
            "</body>\n</html>\n")


def serialize_html_split_page(items: list[dict], layer: str = "body",
                              title: str = "document") -> str:
    """OutputFormat.HTML_SPLIT_PAGE: the HTML export with body items
    grouped into ``<div class="page" data-page="N">`` sections by their
    page provenance (layout/METS items carry ``page_no``; single-page
    sources produce one page div). The page wrappers are transparent to
    re-extraction, so the markdown round-trip matches serialize_html's.
    """
    by_page: dict[int, list[dict]] = {}
    root = items[0] if items else None
    by_idx = {it["item_idx"]: it for it in items}
    for it in items[1:]:
        by_page.setdefault(int(it.get("page_no", 1)), []).append(it)
    pages_html: list[str] = []
    for page_no in sorted(by_page):
        page_items = by_page[page_no]
        page_set = {it["item_idx"] for it in page_items}
        # continuation stubs: a group that opened on an earlier page
        # (list, section) is cloned onto this page so its children keep
        # their structure — remapping them to root rendered cross-page
        # list items as bare paragraphs
        stubs: list[dict] = []
        for it in page_items:
            p = it["parent_idx"]
            while p > 0 and p not in page_set:
                anc = by_idx.get(p)
                if anc is None or anc["label"] not in _GROUP_LABELS:
                    break
                page_set.add(p)
                stub = dict(anc)
                if str(stub.get("text", "")).startswith("ordered list"):
                    # an ordered list continuing onto this page must keep
                    # its numbering: derive start from the first
                    # continued child's numeric marker (cloning the
                    # original _start restarted every page at 1)
                    mk = str(it.get("_marker", ""))
                    if mk.endswith(".") and mk[:-1].isdigit():
                        stub["_start"] = int(mk[:-1])
                stubs.append(stub)
                p = anc["parent_idx"]
        sub = [dict(root)] if root else []
        remap = {0: 0}
        for it in sorted(stubs + page_items, key=lambda x: x["item_idx"]):
            remap[it["item_idx"]] = len(sub)
            it2 = dict(it, item_idx=len(sub),
                       parent_idx=remap.get(it["parent_idx"], 0))
            sub.append(it2)
        inner = serialize_html(sub, layer=layer)
        body = inner.split("<body>\n", 1)[1].rsplit("\n</body>", 1)[0]
        pages_html.append(
            f'<div class="page" data-page="{page_no}">\n{body}\n</div>')
    joined = "\n".join(pages_html)
    safe_title = (title.replace("&", "&amp;").replace("<", "&lt;")
                  .replace(">", "&gt;"))
    return ("<!DOCTYPE html>\n<html>\n<head><meta charset=\"utf-8\">"
            f"<title>{safe_title}</title></head>\n<body>\n{joined}\n"
            "</body>\n</html>\n")


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

    group_labels = {"list": "list", "inline": "inline",
                    "section": "section", "sheet": "sheet",
                    "chapter": "chapter", "group": "unspecified"}

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
                # reference shape (html groundtruth json): marker is ""
                # unless the numbering is explicit ("42."); enumerated
                # derives from the owning group for counter-numbered
                # items. Keeping "" for the default makes export/import
                # invertible — a default emitted as "-" was
                # indistinguishable from a literal "-" marker item.
                m = it.get("_marker", "")
                numeric = m.endswith(".") and m[:-1].isdigit()
                in_ordered = False
                p = it.get("parent_idx", -1)
                if 0 <= p < len(items) and items[p]["label"] == "list":
                    in_ordered = str(
                        items[p].get("text", "")).startswith("ordered list")
                node["enumerated"] = numeric or in_ordered
                node["marker"] = m
        elif kind == "groups":
            if label == "list":
                ordered = it.get("text") == "ordered list" or any(
                    ch.get("_marker", "").endswith(".")
                    and ch.get("_marker", "")[:-1].isdigit()
                    for ch in by_parent.get(it["item_idx"], [])
                )
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
            cap = it.get("_cap_ref")
            node["captions"] = (
                [{"$ref": ref_of[cap]}]
                if cap is not None and cap in ref_of else []
            )
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
    body, has_header = _parse_md_grid(md_table)
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
                "text": text,  # &#124; already undone by _parse_md_grid
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


def serialize_yaml(items: list[dict], name: str = "document") -> str:
    """Flat item list → DoclingDocument YAML — the reference CLI's
    ``--to yaml`` sink (docling/cli/main.py:434,494-498,
    ``document.save_as_yaml`` = yaml.safe_dump of the same dict the
    JSON export writes, block style, keys sorted). Same model as
    :func:`serialize_docling_json`, so yaml.safe_load of this output
    round-trips through ``jsonx.extract_docling_json``."""
    import json as _json

    import yaml as _yaml

    # yaml.dump defaults (sort_keys=True, allow_unicode=False) are what
    # docling-core's save_as_yaml uses — the reference's .md.yaml
    # groundtruth is key-sorted accordingly
    doc = _json.loads(serialize_docling_json(items, name=name))
    return _yaml.safe_dump(doc, default_flow_style=False, sort_keys=True)
