"""Native Column-expression twins of the textnorm scalar functions.

Same semantics as ``functions/textnorm.py`` (the python kernels used
inside the extraction UDF), expressed as JVM-side Catalyst expressions for
hot paths that don't need the full engine — normalize a text column
without a Python worker in the plan. Parity is test-pinned
(tests/test_text_sql.py) over the corpus dirt charset.

Known divergence (documented, excluded from parity tests): whitespace
collapse uses Java's ``(?U)\\s`` which differs from Python ``str.split``
on a few exotic controls (U+001C-001F file/group separators). The corpus
dirt set (NBSP, zero-widths, soft hyphen, narrow NBSP) is mapped by the
unicode table BEFORE collapse on both sides, so those never reach the
divergent path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from docling_spark.functions.textnorm import (
    CLEAN_UNICODE_REPLACEMENTS,
    LIGATURE_MAP,
)


def clean_unicode_col(c: Column) -> Column:
    """docling's fixed unicode table (html_backend.py:4569-4606) as one
    ``translate`` (1:1 maps + deletions) plus the single 1:3 case."""
    matching = ""
    replace = ""
    deletions = ""
    for raw, clean in CLEAN_UNICODE_REPLACEMENTS:
        if len(raw) != 1:
            continue
        if len(clean) == 1:
            matching += raw
            replace += clean
        elif clean == "":
            deletions += raw
        # the only multi-char target is "…" → "..." (handled below)
    c = F.translate(c, matching + deletions, replace)
    return F.regexp_replace(c, "…", "...")


def expand_ligatures_col(c: Column) -> Column:
    """Ligature expansion with post-ligature space absorption for the
    FB00 block ("ﬁ eld" → "field"); IJ/ij and the PUA discard glyph keep
    a following space (page_assemble_model.py:37-54 semantics)."""
    for lig, rep in LIGATURE_MAP.items():
        if "ﬀ" <= lig <= "ﬆ":
            # (?U): Java \w is ASCII-only by default; the Python twin's
            # \w is Unicode, so "ﬁ über" must absorb the space too
            c = F.regexp_replace(c, lig + " (?U)(?=\\w)", rep)
        c = F.regexp_replace(c, lig, rep)
    return c


def fix_stx_col(c: Column) -> Column:
    return F.translate(c, "\x02", "-")


def collapse_whitespace_col(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"(?U)\s+", " "))


def normalize_plain_col(c: Column) -> Column:
    """JVM twin of textnorm.normalize_plain: unicode table + ligatures +
    STX fix + whitespace collapse."""
    return collapse_whitespace_col(
        expand_ligatures_col(fix_stx_col(clean_unicode_col(c)))
    )


def rate_text_quality_col(c: Column) -> Column:
    """JVM twin of textnorm.rate_text_quality: 0.0 on hard-garbage
    patterns, 0.1 penalty per fragmented-word match when ≥ 3."""
    hard = (
        c.contains("�")
        | (F.regexp_count(c, F.lit(r"GLYPH<[0-9A-Fa-f]+>")) > 0)
        | (F.regexp_count(c, F.lit(r"(?:/G\d+){2,}")) > 0)
        | F.regexp_like(c, F.lit(r"^(?:/\w+\s*){2,}"))
    )
    frags = F.regexp_count(
        c, F.lit(r"\b[A-Za-z](?:/[a-z]{1,3}\.[a-z]{1,3}){2,}\b")
    )
    penalty = F.when(frags >= 3, frags.cast("double") * 0.1).otherwise(F.lit(0.0))
    return F.when(hard, F.lit(0.0)).otherwise(
        F.greatest(F.lit(1.0) - penalty, F.lit(0.0))
    )
