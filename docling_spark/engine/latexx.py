"""LaTeX payload → item table (subset engine).

A deliberately bounded re-expression of the reference LaTeX backend
(docling/backend/latex/ — a 1.6k-LoC macro-expanding tokenizer): this
subset covers the structured core exercised by the reference's example
fixtures (tests/data/latex/sources/example_01.tex, example_02.tex,
pinned byte-exact): \\title/\\author/\\maketitle, sectioning commands,
itemize/enumerate, inline ``$..$`` and display ``$$..$$``/equation math
(both render as formula blocks, as the reference does), tabular with
``\\\\`` rows and ``\\hline`` separators (the trailing row after the
last ``\\\\`` stays, reference parity), captions after tables,
``\\cite``/``\\ref`` → ``[key]``, and \\textbf/\\textit unwrapping with
the reference's trailing-space quirk. Full arXiv papers (custom macros,
\\input trees, .sty files) are out of scope — the reference drives a
real TeX expander for those.
"""

from __future__ import annotations

import re

from docling_spark.engine.htmlx import Item, _mk_item, serialize_items


class LatexError(ValueError):
    pass


_SECTION_RE = re.compile(
    r"\\(chapter|section|subsection|subsubsection|paragraph)"
    r"\*?\{([^{}]*)\}")
_COMMENT_RE = re.compile(r"(?<!\\)%.*$", re.MULTILINE)


def _clean_inline(t: str) -> str:
    # \verb|..| protects its payload from every other rule
    verbs: list[str] = []

    def stash_verb(m: re.Match) -> str:
        verbs.append(m.group(2))
        return f"\x00{len(verbs) - 1}\x00"

    t = re.sub(r"\\verb(\W)(.*?)\1", stash_verb, t)
    # inline math spans are opaque (their backslashes are content, not
    # prose commands) — stash them so the unknown-macro cleanup below
    # cannot touch them (matters for $..$ inside table cells)
    t = re.sub(r"\$[^$]+\$", lambda m: (verbs.append(m.group(0)),
                                          f"\x00{len(verbs) - 1}\x00")[1], t)
    # innermost-first fixpoint so nested wrappers unwrap
    # (\textbf{a \textit{b}}); \textbf{X} keeps its following space,
    # \textit{X} swallows it — reference macro-expansion parity
    # (groundtruth example_01 'bold and italictext')
    prev = None
    while prev != t:
        prev = t
        t = re.sub(r"\\textbf\{([^{}]*)\}", r"\1", t)
        t = re.sub(r"\\textit\{([^{}]*)\} ?", r"\1", t)
        t = re.sub(r"\\(?:emph|texttt|textsc|textrm|textsf|underline"
                   r"|mbox|text)\{([^{}]*)\}", r"\1", t)
        t = re.sub(r"\\footnote\{([^{}]*)\}", r" (\1)", t)
        t = re.sub(r"\\href\{([^{}]*)\}\{([^{}]*)\}", r"[\2](\1)", t)
        t = re.sub(r"\\url\{([^{}]*)\}", r"\1", t)
        t = re.sub(r"\\(?:thanks|vspace|hspace|includegraphics)"
                   r"(?:\[[^\]]*\])?\{[^{}]*\}", "", t)
        t = re.sub(r"\\(?:begin|end)\{(?:center|flushleft|flushright"
                   r"|minipage|abstract)\}", " ", t)
    t = re.sub(r"\\(cite|ref|eqref|label)\{([^{}]*)\}", r"[\2]", t)
    t = re.sub(r"\\(?:AND|And|and)\b", "  ", t)
    t = re.sub(r"\\(?:color|textcolor)\{[^{}]*\}", "", t)
    t = re.sub(r"\\(?:large|Large|LARGE|small|footnotesize|scriptsize"
               r"|tiny|huge|Huge|normalsize|bfseries|itshape|centering"
               r"|noindent|par|looseness)\b", " ", t)
    t = re.sub(r"\\footnotemark(?:\[[^\]]*\])?", "", t)
    t = t.replace("\\\\", " ").replace("~", " ")
    t = t.replace("\\ldots", "...").replace("\\dots", "...")
    t = re.sub(r"``|''", '"', t)
    t = re.sub(r"\\([&%#_$])", r"\1", t)
    # any macro still standing is unknown: the reference deletes it and
    # keeps its brace-group contents (pylatexenc default-handler parity,
    # e.g. \mistral vanishes from the Mistral paper's groundtruth)
    t = t.replace("\\{", "\x01").replace("\\}", "\x02")
    t = re.sub(r"\\[A-Za-z@]+\*? ?", "", t)
    t = t.replace("{", "").replace("}", "")
    t = t.replace("\x01", "{").replace("\x02", "}")
    t = " ".join(t.split())
    for i, v in enumerate(verbs):
        t = t.replace(f"\x00{i}\x00", v)
    return t


def _matching_tabular_end(src: str, pos: int) -> int:
    """Offset of the \\end{tabular} matching nesting depth from ``pos``
    (cells routinely embed whole \\begin{tabular} blocks for multi-line
    content — the first \\end would truncate the outer table)."""
    depth = 1
    j = pos
    while depth:
        nb = src.find("\\begin{tabular}", j)
        ne = src.find("\\end{tabular}", j)
        if ne < 0:
            return -1
        if 0 <= nb < ne:
            depth += 1
            j = nb + len("\\begin{tabular}")
        else:
            depth -= 1
            if depth == 0:
                return ne
            j = ne + len("\\end{tabular}")
    return -1


def _flatten_inner_tabulars(content: str) -> str:
    """Replace nested \\begin{tabular}…\\end{tabular} blocks inside cell
    text with their flattened content (row/cell separators → spaces,
    leading [pos]{colspec} args dropped) so the outer row/cell split
    never fires on the inner grid's markers."""
    guard = 0
    while guard < 50:
        guard += 1
        m = re.search(r"\\begin\{tabular\}", content)
        if not m:
            return content
        end = _matching_tabular_end(content, m.end())
        if end < 0:
            return content
        inner = content[m.end():end]
        inner = re.sub(r"^\s*\[[^\]]*\]", "", inner, count=1)
        bm = re.match(r"\s*\{", inner)
        if bm:
            depth = 1
            j = bm.end()
            while j < len(inner) and depth:
                if inner[j] == "{" and inner[j - 1] != "\\":
                    depth += 1
                elif inner[j] == "}" and inner[j - 1] != "\\":
                    depth -= 1
                j += 1
            inner = inner[j:]
        inner = inner.replace("\\\\", " ").replace("&", " ")
        content = (content[:m.start()] + inner
                   + content[end + len("\\end{tabular}"):])
    return content


def _command_arg(src: str, command: str) -> str | None:
    """Brace-matched argument of ``\\command{...}`` (handles nesting)."""
    m = re.search(r"\\" + command + r"\s*\{", src)
    if not m:
        return None
    depth = 1
    i = m.end()
    start = i
    while i < len(src) and depth:
        c = src[i]
        if c == "{" and src[i - 1] != "\\":
            depth += 1
        elif c == "}" and src[i - 1] != "\\":
            depth -= 1
        i += 1
    return src[start:i - 1] if depth == 0 else None


_INPUT_RE = re.compile(r"\\(?:input|include)\{([^{}]*)\}")


def _resolve_inputs(main: str, files: dict[str, str],
                    depth: int = 0, seen: frozenset = frozenset()) -> str:
    """Inline ``\\input{name}`` / ``\\include{name}`` from an archive's
    member map (the reference resolves from the filesystem with a
    circular-include guard and a depth limit of 10 —
    docling/backend/latex/handlers/macros.py:368-399)."""

    def sub(m: re.Match) -> str:
        name = m.group(1).strip()
        for cand in (name, name + ".tex"):
            if cand in files and cand not in seen:
                if depth >= 10:
                    return ""
                return _resolve_inputs(files[cand], files, depth + 1,
                                       seen | {cand})
        return ""

    return _INPUT_RE.sub(sub, main)


def extract_latex_archive(payload: bytes) -> tuple[str, list[Item], dict]:
    """Zip of a tex tree (arXiv-style multi-file source) → item table:
    the main file (\\documentclass + \\begin{document}) is located,
    its \\input/\\include tree inlined from the archive members, and the
    flattened source run through :func:`extract_latex`."""
    import io
    import zipfile

    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise LatexError(f"not a zip archive: {exc}") from exc
    files: dict[str, str] = {}
    for name in zf.namelist():
        if name.endswith((".tex", ".sty", ".bbl")) and \
                not name.endswith("/"):
            base = name.rsplit("/", 1)[-1]
            text = zf.read(name).decode("utf-8", errors="replace")
            files.setdefault(base, text)
            files.setdefault(name, text)
    main = next(
        (t for t in files.values()
         if "\\begin{document}" in t and "\\documentclass" in t),
        None,
    )
    if main is None:
        raise LatexError("archive holds no main .tex file")
    return extract_latex(_resolve_inputs(main, files))


def extract_latex(payload: str) -> tuple[str, list[Item], dict]:
    """payload (LaTeX source) → (extracted_text, items, metrics)."""
    if "\\begin{document}" not in payload:
        raise LatexError("no \\begin{document} found")
    raw_title = _command_arg(payload, "title")
    title = _clean_inline(raw_title) if raw_title is not None else None
    raw_author = _command_arg(payload, "author")
    if raw_author is not None:
        # the reference keeps \thanks{...} footnote text inline in the
        # author block (1706.03762 groundtruth renders the contribution
        # statement right after the first author's name)
        raw_author = re.sub(r"\\thanks\s*\{([^{}]*)\}", r" \1 ",
                            raw_author)
    author = _clean_inline(raw_author) if raw_author is not None else None

    body = payload.split("\\begin{document}", 1)[1]
    body = body.split("\\end{document}", 1)[0]
    body = _COMMENT_RE.sub("", body)

    items: list[Item] = []
    _mk_item(items, -1, "unspecified", 0, "_root_", "body")
    hstack: list[tuple[int, int]] = []

    def parent() -> int:
        return hstack[-1][1] if hstack else 0

    def add_heading(level: int, text: str) -> None:
        while hstack and hstack[-1][0] >= level:
            hstack.pop()
        par = hstack[-1][1] if hstack else 0
        idx = _mk_item(items, par, "section_header", 1, text, "body")
        items[idx]["_hlevel"] = level + 1
        hstack.append((level, idx))

    def add_text(text: str) -> None:
        text = _clean_inline(text)
        if text:
            _mk_item(items, parent(), "text", 1, text, "body")

    def add_formula(tex: str, inline: bool = False) -> None:
        tex = " ".join(tex.split())
        if tex:
            idx = _mk_item(items, parent(), "formula", 1, tex, "body")
            if inline:
                items[idx]["_inline"] = True

    def add_tabular(content: str, caption: str | None) -> None:
        content = _flatten_inner_tabulars(content)
        content = re.sub(r"\\hline", "", content)
        rows = [r.strip() for r in content.split("\\\\")]
        grid = []
        for r in rows:
            cells = [_clean_inline(c) for c in r.split("&")]
            grid.append(cells)
        if not grid:
            return
        ncols = max(len(r) for r in grid)
        md = []
        for ri, r in enumerate(grid):
            cells = [c.replace("|", "&#124;") for c in r]
            cells += [""] * (ncols - len(cells))
            md.append("| " + " | ".join(cells) + " |")
            if ri == 0:
                md.append("| " + " | ".join("-" for _ in range(ncols)) + " |")
        idx = _mk_item(items, parent(), "table", 1, "\n".join(md), "body")
        items[idx]["num_rows"] = len(grid)
        items[idx]["num_cols"] = ncols
        if caption:
            _mk_item(items, parent(), "caption", 1, caption, "body")

    # tokenize the body into blocks
    pos = 0
    para: list[str] = []

    def flush_para() -> None:
        text = " ".join(para)
        para.clear()
        # split inline math into its own formula blocks (reference
        # behavior: '$E = mc^2$' leaves its paragraph)
        parts = re.split(r"(\$[^$]+\$|\\\(.*?\\\))", text)
        for part in parts:
            if part.startswith("$") and part.endswith("$") and len(part) > 2:
                add_formula(part[1:-1], inline=True)
            elif part.startswith("\\(") and part.endswith("\\)"):
                add_formula(part[2:-2], inline=True)
            else:
                add_text(part)

    token_re = re.compile(
        r"(\\(?:chapter|section|subsection|subsubsection|paragraph)"
        r"\*?\{[^{}]*\})"
        r"|(\\maketitle)"
        r"|(\$\$.*?\$\$|\\\[.*?\\\])"
        r"|(\\begin\{(?:equation|align|gather|eqnarray|displaymath|math)"
        r"\*?\}.*?\\end\{(?:equation|align|gather|eqnarray|displaymath"
        r"|math)\*?\})"
        r"|(\\begin\{(?:itemize|enumerate|description)\}.*?"
        r"\\end\{(?:itemize|enumerate|description)\})"
        r"|(\\begin\{(?:table|figure|wrapfigure|wraptable)\*?\}.*?"
        r"\\end\{(?:table|figure|wrapfigure|wraptable)\*?\})"
        r"|(\\begin\{tabular\}.*?\\end\{tabular\})"
        r"|(\\begin\{(?:verbatim|lstlisting)\}.*?"
        r"\\end\{(?:verbatim|lstlisting)\})"
        r"|(\\begin\{abstract\})"
        r"|(\\includegraphics(?:\[[^\]]*\])?\{[^{}]*\})",
        re.DOTALL,
    )

    def add_plain_segment(segment: str) -> None:
        for piece in re.split(r"\n\s*\n", segment):
            piece = piece.strip()
            if piece:
                para.append(piece)
                flush_para()

    for m in token_re.finditer(body):
        add_plain_segment(body[pos:m.start()])
        pos = m.end()
        tok = m.group(0)
        if m.group(1):
            sec = _SECTION_RE.match(tok)
            if sec:
                level = {"chapter": 0, "section": 1, "subsection": 2,
                         "subsubsection": 3, "paragraph": 4}[sec.group(1)]
                add_heading(level, _clean_inline(sec.group(2)))
        elif m.group(2):  # \maketitle
            if title:
                idx = _mk_item(items, 0, "title", 1, title, "body")
                items[idx]["_hlevel"] = 1
            if author:
                _mk_item(items, 0, "text", 1, author, "body")
        elif m.group(3):  # $$..$$ or \[..\]
            add_formula(tok[2:-2])
        elif m.group(4):  # math environments
            inner = re.sub(
                r"\\(?:begin|end)\{(?:equation|align|gather|eqnarray"
                r"|displaymath|math)\*?\}", "", tok)
            inner = re.sub(r"\\label\{[^{}]*\}", "", inner)
            add_formula(inner)
        elif m.group(5):  # itemize / enumerate / description
            gidx = _mk_item(items, parent(), "list", 1, "list", "body")
            inner = re.sub(
                r"\\(?:begin|end)\{(?:itemize|enumerate|description)\}",
                "", tok)
            for item_text in inner.split("\\item")[1:]:
                opt = re.match(r"^\s*\[([^\]]*)\]", item_text)
                if opt:
                    item_text = (opt.group(1) + " "
                                 + item_text[opt.end():])
                t = _clean_inline(item_text)
                if t:
                    _mk_item(items, gidx, "list_item", 2, t, "body")
        elif m.group(6) or m.group(7):  # table/figure envs, bare tabular
            # caption + colspec args brace-match (captions routinely nest
            # \textbf{..}; colspecs nest @{..} — flat regexes miss both)
            cap_text = _command_arg(tok, "caption")
            cap = cap_text is not None
            tab = None
            tb = re.search(r"\\begin\{tabular\}\s*(?:\[[^\]]*\])?\s*\{",
                           tok)
            if tb:
                depth = 1
                j = tb.end()
                while j < len(tok) and depth:
                    if tok[j] == "{" and tok[j - 1] != "\\":
                        depth += 1
                    elif tok[j] == "}" and tok[j - 1] != "\\":
                        depth -= 1
                    j += 1
                end = _matching_tabular_end(tok, j)
                tab = tok[j:end if end >= 0 else len(tok)]
            if tab is not None:
                add_tabular(tab,
                            _clean_inline(cap_text) if cap else None)
            elif m.group(6) and ("\\begin{figure" in tok
                                 or "\\begin{wrapfigure" in tok):
                graphics = re.findall(
                    r"\\includegraphics(?:\[[^\]]*\])?\{([^{}]*)\}", tok)
                for g in graphics:
                    _mk_item(items, parent(), "text", 1,
                             "Image: " + g.strip(), "body")
                    _mk_item(items, parent(), "picture", 1, "", "body")
                if not graphics:
                    _mk_item(items, parent(), "picture", 1, "", "body")
                if cap:
                    _mk_item(items, parent(), "caption", 1,
                             _clean_inline(cap_text), "body")
        elif m.group(9):  # \begin{abstract} → '## Abstract' heading;
            # the body text that follows flows as normal paragraphs
            # (md_backend-style heading; \end{abstract} is inert)
            add_heading(1, "Abstract")
        elif m.group(10):  # standalone \includegraphics (no figure env)
            g = re.search(r"\{([^{}]*)\}\s*$", tok)
            if g:
                _mk_item(items, parent(), "text", 1,
                         "Image: " + g.group(1).strip(), "body")
                _mk_item(items, parent(), "picture", 1, "", "body")
        elif m.group(8):  # verbatim / lstlisting → code
            inner = re.sub(
                r"\\begin\{(?:verbatim|lstlisting)\}(?:\[[^\]]*\])?\n?"
                r"|\\end\{(?:verbatim|lstlisting)\}", "", tok)
            code = inner.strip("\n").rstrip()
            if code.strip():
                _mk_item(items, parent(), "code", 1, code, "body")
    add_plain_segment(body[pos:])

    text = serialize_items(items, layer="body")
    metrics = {
        "pages_parsed": 1,
        "parse_score": 1.0,
        "boilerplate_ratio": 0.0,
        "n_items": len(items) - 1,
    }
    return text, items, metrics
