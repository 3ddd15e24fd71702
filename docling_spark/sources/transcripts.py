"""Deterministic synthetic transcripts source (FIXTURES.md §1-2).

Generates the Iceberg-shaped transcripts table
``(conv_id, turn_idx, role, text, tool, ts)`` with hash-derived content:
every value is a pure function of ``(seed, conv_idx, turn_idx)`` via md5,
so the table is identical regardless of partitioning, parallelism, or
generation order — the property that makes goldens and the two-parallelism
scaling benchmark meaningful.

Skew: 1 in 100 conversations is "long" (hundreds of turns) to exercise the
salting path (FIXTURES.md: Zipf-skewed turn counts).

Distributed generation: ``spark.range(n_convs)`` → ``mapInPandas`` — linear
scale-out, no shuffle, no driver-side materialization.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
from collections.abc import Iterator

import pandas as pd

from docling_spark.schema import TRANSCRIPTS_SCHEMA

_WORDS = (
    "the quick brown fox jumps over lazy dog data pipeline spark engine "
    "extract content heading table cell column row stream batch shuffle "
    "partition cluster duck mallard water family science report value "
    "model layout reading order text quality merge split token index"
).split()

# unicode dirt injected into plain payloads (normalization targets, §2.g)
_DIRT = [" ", "​", "’", "“", "—", "­",
         "…", "ﬁ", "ﬂ", "\x02"]

ROLES = ("user", "assistant", "tool", "system")
TOOLS = ("", "html", "md", "csv", "pdfish", "code")


def _h(*parts) -> int:
    """Stable 64-bit hash of the key tuple (never Python's randomized hash)."""
    raw = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:8], "big")


def _words(key: int, n: int) -> str:
    return " ".join(_WORDS[_h(key, i) % len(_WORDS)] for i in range(n))


def _sentence(key: int, n: int = 8) -> str:
    s = _words(key, n)
    return s[0].upper() + s[1:] + "."


def _plain_payload(key: int) -> str:
    n_sent = 1 + _h(key, "ns") % 6
    parts = []
    for i in range(n_sent):
        s = _sentence(_h(key, "s", i))
        if _h(key, "dirt", i) % 3 == 0:
            d = _DIRT[_h(key, "dc", i) % len(_DIRT)]
            pos = _h(key, "dp", i) % max(len(s) - 1, 1)
            s = s[:pos] + d + s[pos:]
        parts.append(s)
    return " ".join(parts)


def _html_payload(key: int) -> str:
    title = _words(_h(key, "t"), 3).title()
    h1 = _words(_h(key, "h1"), 4).title()
    para1 = _sentence(_h(key, "p1"), 12)
    para2 = _sentence(_h(key, "p2"), 10)
    boiler = _sentence(_h(key, "b"), 5)
    lis = "".join(
        f"<li>{_words(_h(key, 'li', i), 4)}</li>" for i in range(2 + _h(key, "nli") % 4)
    )
    rows = "".join(
        "<tr>" + "".join(
            f"<td>{_words(_h(key, 'c', r, c), 2)}</td>" for c in range(3)
        ) + "</tr>"
        for r in range(2 + _h(key, "nr") % 3)
    )
    code = f"def f{_h(key, 'fn') % 100}():\n    return {_h(key, 'rv') % 1000}"
    variant = _h(key, "v") % 4
    body = f"<h1>{h1}</h1><p>{para1} <b>{_words(_h(key,'bd'),2)}</b> tail.</p>"
    if variant >= 1:
        body += f"<h2>{_words(_h(key,'h2'),3).title()}</h2><ul>{lis}</ul>"
    if variant >= 2:
        body += f"<table><tr><th>A</th><th>B</th><th>C</th></tr>{rows}</table>"
    if variant >= 3:
        body += f'<pre><code class="language-python">{code}</code></pre>'
    return (
        f"<html><head><title>{title}</title><style>b{{x}}</style></head>"
        f"<body><div>{boiler}</div>{body}"
        f"<footer>footer {_words(_h(key,'f'),2)}</footer></body></html>"
    )


def _md_payload(key: int) -> str:
    h1 = _words(_h(key, "h1"), 3).title()
    para = _sentence(_h(key, "p"), 14)
    lis = "\n".join(f"- {_words(_h(key, 'li', i), 3)}" for i in range(3))
    code = f"x = {_h(key, 'x') % 100}\nprint(x)"
    return f"# {h1}\n\n{para}\n\n{lis}\n\n```python\n{code}\n```\n"


def _latex_payload(key: int) -> str:
    """Small LaTeX article: section + paragraphs with inline math and a
    cite, display equation, itemize, tabular — drives the texwalk node
    parser in the headline bench."""
    sec = _words(_h(key, "lsec"), 3).title()
    body = _sentence(_h(key, "lb1"), 10)
    extra = _sentence(_h(key, "lb2"), 8)
    items = "\n".join(
        f"\\item {_words(_h(key, 'li', i), 4)}" for i in range(3))
    rows = "\n".join(
        f"{_words(_h(key, 'tc', r, 0), 1)} & "
        f"{_words(_h(key, 'tc', r, 1), 1)} \\\\"
        for r in range(3))
    return (
        "\\documentclass{article}\n"
        "\\title{" + _words(_h(key, "lt"), 4).title() + "}\n"
        "\\begin{document}\n\\maketitle\n\n"
        "\\section{" + sec + "}\n\n"
        + body + " \\textbf{" + _words(_h(key, "lbold"), 2) + "} "
        "$x_{" + str(key % 97) + "}^2$ \\cite{src" + str(key % 13) + "}.\n\n"
        "$$E_{" + str(key % 7) + "} = mc^2$$\n\n"
        "\\begin{itemize}\n" + items + "\n\\end{itemize}\n\n"
        "\\begin{tabular}{ll}\n" + rows + "\n\\end{tabular}\n\n"
        + extra + "\n\\end{document}\n"
    )


def _csv_payload(key: int) -> str:
    delim = [",", ";", "\t", "|"][_h(key, "d") % 4]
    ncol = 3 + _h(key, "nc") % 3
    header = delim.join(f"col{i}" for i in range(ncol))
    rows = [
        delim.join(_WORDS[_h(key, r, c) % len(_WORDS)] for c in range(ncol))
        for r in range(2 + _h(key, "nr") % 5)
    ]
    return header + "\n" + "\n".join(rows)


def _pdfish_payload(key: int) -> str:
    cells = [
        {"page_no": 1, "bbox": [0, 0, 100, 6],
         "text": f"Report {_h(key, 'rp') % 999}", "conf": 0.9,
         "label": "page_header"},
        {"page_no": 1, "bbox": [10, 10, 90, 18],
         "text": _words(_h(key, "ti"), 4).title(), "conf": 0.95,
         "label": "title"},
    ]
    y = 24.0
    # two-column body with a hyphenated break in the left column
    lw = _words(_h(key, "lw"), 6)
    cells.append({"page_no": 1, "bbox": [0, y, 45, y + 8],
                  "text": lw + " exam-", "conf": 0.95, "label": "text"})
    cells.append({"page_no": 1, "bbox": [0, y + 9, 45, y + 17],
                  "text": "ple " + _words(_h(key, "lw2"), 4) + ".",
                  "conf": 0.95, "label": "text"})
    cells.append({"page_no": 1, "bbox": [55, y, 100, y + 8],
                  "text": _sentence(_h(key, "rw"), 5), "conf": 0.9,
                  "label": "text"})
    cells.append({"page_no": 1, "bbox": [55, y + 9, 100, y + 17],
                  "text": _sentence(_h(key, "rw2"), 5), "conf": 0.9,
                  "label": "text"})
    # noise + garbage cells exercising the filters
    cells.append({"page_no": 1, "bbox": [0, 60, 40, 66],
                  "text": _words(_h(key, "nz"), 3), "conf": 0.2,
                  "label": "text"})
    if _h(key, "g") % 2 == 0:
        cells.append({"page_no": 1, "bbox": [0, 70, 40, 76],
                      "text": "GLYPH<ab> GLYPH<cd>", "conf": 0.9,
                      "label": "text"})
    # small table region
    for r in range(2):
        for c in range(2):
            cells.append({
                "page_no": 1,
                "bbox": [c * 22.0, 80 + r * 8.0, c * 22.0 + 20.0, 86 + r * 8.0],
                "text": _WORDS[_h(key, "tc", r, c) % len(_WORDS)],
                "conf": 0.9, "label": "table_cell"})
    cells.append({"page_no": 1, "bbox": [0, 95, 100, 99],
                  "text": "Page 1 of 1", "conf": 0.9, "label": "page_footer"})
    return "\n".join(json.dumps(c) for c in cells)


def _vtt_payload(key: int) -> str:
    """WebVTT transcript slab: cues with voices, occasional italics and a
    multi-line cue (vtt engine coverage; cue ≈ turn per SURVEY.md §2.a)."""
    n_cues = 2 + _h(key, "nc") % 4
    out = ["WEBVTT", ""]
    t = _h(key, "t0") % 30
    for i in range(n_cues):
        dur = 2 + _h(key, "d", i) % 5
        s_m, s_s = divmod(t, 60)
        e_m, e_s = divmod(t + dur, 60)
        out.append(f"{s_m:02d}:{s_s:02d}.000 --> {e_m:02d}:{e_s:02d}.000")
        speaker = ["Alice", "Bob", "Speaker A"][_h(key, "sp", i) % 3]
        line = _sentence(_h(key, "cl", i), 6)
        if _h(key, "it", i) % 4 == 0:
            w = _words(_h(key, "iw", i), 2)
            line = f"{line[:-1]} <i>{w}</i>."
        if _h(key, "ml", i) % 5 == 0:
            out.append(f"<v {speaker}>{line}")
            out.append(_sentence(_h(key, "cl2", i), 4))
        else:
            out.append(f"<v {speaker}>{line}")
        out.append("")
        t += dur
    return "\n".join(out)


def _asciidoc_payload(key: int) -> str:
    title = _words(_h(key, "at"), 3).title()
    sec = _words(_h(key, "as"), 3).title()
    para = _sentence(_h(key, "ap"), 10)
    lis = "\n".join(f"* {_words(_h(key, 'al', i), 3)}" for i in range(2))
    return (
        f"= {title}\n\n{para}\n\n== {sec}\n\n{lis}\n\n"
        f"|H1|H2|\n|{_WORDS[_h(key, 'c1') % len(_WORDS)]}"
        f"|{_WORDS[_h(key, 'c2') % len(_WORDS)]}|\n"
    )


def _email_payload(key: int) -> str:
    subj = _words(_h(key, "sj"), 4).title()
    user = f"user{_h(key, 'u') % 1000}"
    body1 = _sentence(_h(key, "b1"), 10)
    body2 = _sentence(_h(key, "b2"), 8)
    return (
        f"From: {_words(_h(key, 'fn'), 1).title()} Example <{user}@example.com>\n"
        f"To: Ops Team <ops@example.com>\n"
        f"Subject: {subj}\n"
        f"Date: Mon, 17 Aug 2026 {(_h(key, 'hh') % 24):02d}:30:00 +0000\n\n"
        f"{body1}\n\n{body2}\n"
    )


def _code_payload(key: int) -> str:
    kind = _h(key, "k") % 3
    if kind == 0:
        return (
            "Traceback (most recent call last):\n"
            f'  File "job_{_h(key, "f") % 99}.py", line {_h(key, "l") % 500}\n'
            f"ValueError: {_words(_h(key, 'm'), 4)}"
        )
    if kind == 1:
        return json.dumps(
            {"status": "ok", "rows": _h(key, "r") % 10000,
             "warnings": [_words(_h(key, "w"), 3)]},
            indent=2,
        )
    return (
        f"--- a/src/mod_{_h(key, 'm1') % 50}.py\n+++ b/src/mod_{_h(key, 'm1') % 50}.py\n"
        f"@@ -1,2 +1,2 @@\n-old = {_h(key, 'o') % 100}\n+new = {_h(key, 'n') % 100}"
    )


def _malformed_payload(key: int) -> str:
    kind = _h(key, "mk") % 3
    if kind == 0:
        return '{"page_no": 1, "bbox": [0,0,'  # truncated pdfish
    if kind == 1:
        return ""  # empty
    return "x" * (9 * 1024 * 1024)  # oversize → skipped


def n_turns_for_conv(conv_idx: int, long_every: int = 100, long_turns: int = 400) -> int:
    """Zipf-ish skew: 1 in ``long_every`` conversations is long (exercises
    salting); the rest have 2-30 turns."""
    if long_every and conv_idx % long_every == long_every - 1:
        return long_turns + _h(conv_idx, "long") % (long_turns // 2)
    return 2 + _h(conv_idx, "n") % 29


def make_turn(conv_idx: int, turn_idx: int) -> dict:
    """The pure row function: (conv_idx, turn_idx) → transcript row."""
    conv_id = f"conv{conv_idx:08d}"
    key = _h(conv_idx, turn_idx)
    role = ROLES[(turn_idx + (1 if _h(key, "rs") % 5 == 0 else 0)) % 2] \
        if turn_idx % 7 != 3 else "tool"
    if turn_idx == 0 and _h(key, "sys") % 10 == 0:
        role = "system"
    # malformed ~2% (FIXTURES.md §2): failure containment coverage
    sel = _h(key, "fmt") % 100
    if sel < 2:
        tool = TOOLS[_h(key, "mtool") % len(TOOLS)]
        text = _malformed_payload(key)
        # oversize blobs only occasionally (they're expensive to carry)
        if len(text) > 1_000_000 and _h(key, "keep") % 10 != 0:
            text = '{"page_no": bad'
    elif sel < 36:
        tool, text = "", _plain_payload(key)
    elif sel < 38:
        tool, text = "asciidoc", _asciidoc_payload(key)
    elif sel < 40:
        tool, text = "email", _email_payload(key)
    elif sel < 58:
        tool, text = "html", _html_payload(key)
    elif sel < 60:
        tool, text = "latex", _latex_payload(key)
    elif sel < 72:
        tool, text = "md", _md_payload(key)
    elif sel < 80:
        tool, text = "csv", _csv_payload(key)
    elif sel < 88:
        tool, text = "pdfish", _pdfish_payload(key)
    elif sel < 92:
        tool, text = "vtt", _vtt_payload(key)
    else:
        tool, text = "code", _code_payload(key)
    ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        seconds=(conv_idx % 86400) * 60 + 7 * turn_idx
    )
    return {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": ts.replace(tzinfo=None),
    }


def gen_conversation(conv_idx: int, long_every: int = 100,
                     long_turns: int = 400) -> list[dict]:
    return [
        make_turn(conv_idx, t)
        for t in range(n_turns_for_conv(conv_idx, long_every, long_turns))
    ]


def transcripts_df(spark, n_convs: int, partitions: int | None = None,
                   long_every: int = 100, long_turns: int = 400):
    """Distributed deterministic generation: range → mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for conv_idx in pdf["id"].tolist():
                rows.extend(gen_conversation(int(conv_idx), long_every, long_turns))
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: [] for f in TRANSCRIPTS_SCHEMA.fields}
            )

    rng = spark.range(n_convs)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
