"""Text-analysis operators over a document corpus — the training-data
pipeline functions (language-ID, quality scoring, token counting, document
fingerprinting) expressed as JVM-side Column expressions wherever possible
(no Python in the hot path; whole-stage codegen keeps these fused with the
scan).

Every operator here has an exact ANSI-SQL twin in ``__spark_entry__`` so the
DuckDB oracle validates parity bit-for-bit. Formulas are therefore written
in the common subset (regexp splits, md5, simple arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small fixed stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que"],
}


def norm_text(col) -> Column:
    """Canonical text normalization shared by fingerprint/dedup: lowercase +
    whitespace collapse + trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col) -> Column:
    """Whitespace tokenization of trimmed text (BPE-ish token counting uses
    the same splitter at both engines)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col) -> Column:
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(tokens(col)))


def char_count(col) -> Column:
    return F.length(col)


def avg_token_len(col) -> Column:
    """Mean token length: (chars excluding separators) / tokens."""
    n_tok = token_count(col)
    n_chars = F.length(F.regexp_replace(F.trim(col), r"\s+", ""))
    return F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(F.lit(0.0))


def stopword_hits(col, lang: str) -> Column:
    words = STOPWORDS[lang]
    arr = tokens(F.lower(col))
    return F.size(F.filter(arr, lambda t: t.isin(words)))


def stopword_ratio(col, lang: str = "en") -> Column:
    n = token_count(col)
    return F.when(n > 0, stopword_hits(col, lang).cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col) -> Column:
    """Composite quality in [0,1]: length band + stopword presence + token
    shape (the reference's rate_text_quality analog for corpus curation;
    formula kept in the SQL-expressible subset)."""
    n_tok = token_count(col).cast("double")
    len_band = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    sw = F.least(stopword_ratio(col, "en") * 5.0, F.lit(1.0))
    atl = avg_token_len(col)
    shape = F.when((atl >= 2.0) & (atl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_band + sw + shape) / F.lit(3.0), 6)


def lang_id(col) -> Column:
    """Stopword-vote language ID: argmax of per-language hit counts with a
    fixed tie order (en > de > fr > es), 'und' when no hits."""
    hits = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # reversed fixed order so earlier langs win ties via later when-overwrite
    for lang in ("es", "fr", "de", "en"):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (rolling-hash analog in the md5 family so DuckDB reproduces it)."""
    return F.md5(norm_text(col))


def doc_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One narrow projection computing all per-document text statistics."""
    c = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count(c).alias("n_tokens"),
        char_count(c).alias("n_chars2"),
        F.round(avg_token_len(c), 6).alias("avg_token_len"),
        F.round(stopword_ratio(c, "en"), 6).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
