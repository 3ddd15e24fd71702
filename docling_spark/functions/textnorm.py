"""Text normalization scalar functions.

Re-expressions (from public reference behavior) of the per-turn text
normalization surface of yzkee/docling:

- ``clean_unicode``   — docling/backend/html_backend.py:4569-4606
- ``sanitize_lines``  — docling/models/stages/page_assemble/page_assemble_model.py:112-157
- ligature expansion  — page_assemble_model.py:37-54
- ``rate_text_quality`` — docling/models/stages/page_preprocessing/page_preprocessing_model.py:30-35,126-151

All functions here are pure Python (no Spark imports) so they can run inside
Arrow-batched pandas UDFs as well as in plain unit tests. The SQL-expressible
subset has native Column-expression twins in ``text_sql.py`` (same semantics,
JVM-side, used on hot paths where exact parity with these functions is
test-pinned).
"""

from __future__ import annotations

import re

# docling html_backend.py:4582-4602 — fixed replacement table, applied in order.
CLEAN_UNICODE_REPLACEMENTS: tuple[tuple[str, str], ...] = (
    (" ", " "),  # non-breaking space
    ("​", ""),  # zero-width space
    ("‌", ""),  # zero-width non-joiner
    ("‍", ""),  # zero-width joiner
    ("‐", "-"),  # hyphen
    ("‑", "-"),  # non-breaking hyphen
    ("‒", "-"),  # figure dash
    ("–", "-"),  # en dash
    ("—", "-"),  # em dash
    ("―", "-"),  # horizontal bar
    ("‘", "'"),  # left single quote
    ("’", "'"),  # right single quote
    ("“", '"'),  # left double quote
    ("”", '"'),  # right double quote
    ("…", "..."),  # ellipsis
    ("­", ""),  # soft hyphen
    ("﻿", ""),  # zero width no-break space / BOM
    (" ", " "),  # narrow no-break space
    ("⁠", ""),  # word joiner
)


_CLEAN_SCAN_RE = re.compile(
    # re.escape: a future table entry whose raw char is a class metachar
    # (']', '\\', '^', '-') must not silently corrupt the gate class
    "[" + re.escape("".join(raw for raw, _ in CLEAN_UNICODE_REPLACEMENTS))
    + "]"
)


def clean_unicode(text: str) -> str:
    """Apply docling's fixed unicode sanitization table.

    Fast path: one regex scan skips the 19 str.replace passes for the
    overwhelmingly common all-ASCII case (same output by construction)."""
    if not _CLEAN_SCAN_RE.search(text):
        return text
    for raw, clean in CLEAN_UNICODE_REPLACEMENTS:
        text = text.replace(raw, clean)
    return text


# page_assemble_model.py:37-54
LIGATURE_MAP: dict[str, str] = {
    "ﬀ": "ff",
    "ﬁ": "fi",
    "ﬂ": "fl",
    "ﬃ": "ffi",
    "ﬄ": "ffl",
    "ﬅ": "st",
    "ﬆ": "st",
    "Ĳ": "IJ",
    "ĳ": "ij",
    "": "",
}
_LIGATURE_RE = re.compile(r"([ﬀ-ﬆ]|Ĳ|ĳ|)( (?=\w))?")

_WORD_RE = re.compile(r"\b[\w]+\b")


def expand_ligatures(text: str) -> str:
    """Expand presentation-form ligatures; absorb spurious post-ligature space
    for the fb00-fb06 block ("ﬁ eld" → "field"); keep real word boundaries for
    IJ/ij and the PUA discard glyph."""
    if text.isascii():  # every mapped glyph is non-ASCII
        return text
    return _LIGATURE_RE.sub(
        lambda m: (
            LIGATURE_MAP[m.group(1)]
            + ("" if "ﬀ" <= m.group(1) <= "ﬆ" else (m.group(2) or ""))
        ),
        text,
    )


def sanitize_lines(lines: list[str]) -> str:
    """Merge parsed text lines into one string with de-hyphenation.

    A line ending in ``-`` whose last word and the next line's first word are
    alphanumeric loses the hyphen and joins without a space; otherwise lines
    join with a single space. Then applies quote/bullet/fraction-slash
    normalization and ligature expansion, and strips the result.
    (page_assemble_model.py:112-157)
    """
    if len(lines) == 0:
        return ""
    lines = list(lines)
    for ix, line in enumerate(lines[1:]):
        prev_line = lines[ix]
        if prev_line.endswith("-"):
            prev_words = _WORD_RE.findall(prev_line)
            line_words = _WORD_RE.findall(line)
            if (
                len(prev_words)
                and len(line_words)
                and prev_words[-1].isalnum()
                and line_words[0].isalnum()
            ):
                lines[ix] = prev_line[:-1]
        else:
            lines[ix] += " "
    text = "".join(lines)
    text = text.replace("⁄", "/")  # fraction slash
    text = text.replace("’", "'")
    text = text.replace("‘", "'")
    text = text.replace("“", '"')
    text = text.replace("”", '"')
    text = text.replace("•", "·")  # bullet → middle dot
    text = expand_ligatures(text)
    return text.strip()


def fix_stx(text: str) -> str:
    """docling replaces the STX control char with a hyphen in cell text
    (page_assemble_model.py:180-182)."""
    return text.replace("\x02", "-")


# page_preprocessing_model.py:30-35
_GLYPH_RE = re.compile(r"GLYPH<[0-9A-Fa-f]+>")
_SLASH_G_RE = re.compile(r"(?:/G\d+){2,}")
_FRAG_RE = re.compile(r"\b[A-Za-z](?:/[a-z]{1,3}\.[a-z]{1,3}){2,}\b")
_SLASH_NUMBER_GARBAGE_RE = re.compile(r"(?:/\w+\s*){2,}")


def rate_text_quality(text: str) -> float:
    """Parser-garbage score in [0,1]; 0.0 on hard-error patterns, penalty
    0.1 per fragmented-word match when there are >= 3 of them.
    (page_preprocessing_model.py:126-151)."""
    # hard errors evaluated ONCE (the substring scans gate the regex);
    # only the three slash-dependent patterns sit behind the '/' check —
    # same fast-path cost, no duplicated hard-error logic to drift
    if "�" in text or ("GLYPH<" in text and _GLYPH_RE.search(text)):
        return 0.0
    if "/" not in text:
        return 1.0  # every pattern below needs a literal '/'
    if _SLASH_G_RE.search(text) or _SLASH_NUMBER_GARBAGE_RE.match(text):
        return 0.0
    penalty = 0.0
    frag_matches = _FRAG_RE.findall(text)
    if len(frag_matches) >= 3:
        penalty += 0.1 * len(frag_matches)
    return max(1.0 - penalty, 0.0)


_WS_RE = re.compile(r"\s+")


def collapse_whitespace(text: str) -> str:
    """Whitespace collapse used by the HTML inline walker
    (html_backend.py:1840-1942: ``" ".join(text.split())`` semantics)."""
    return " ".join(text.split())


def normalize_plain(text: str) -> str:
    """The full plain-text payload normalization: unicode table + ligatures +
    STX fix + whitespace collapse. This is the per-turn equality surface for
    ``tool=''`` payloads and has an exact SQL twin in text_sql.py /
    __spark_entry__ oracles."""
    return collapse_whitespace(expand_ligatures(fix_stx(clean_unicode(text))))
