"""Post-assembly enrichment stages over the items table.

The reference chains enrichment models after document assembly: each
model implements ``prepare_element`` — a gate choosing which items it
touches — and a batched ``__call__`` over the gated elements
(docling/models/base_model.py:218; driver loop
docling/pipeline/base_pipeline.py:107-129; batch size
``elements_batch_size``, docling/datamodel/settings.py:29-38). Stages
are pluggable via factories (docling/models/factories/).

Spark re-expression: a stage is ``(name, applies, kernel)`` where
``applies`` is a boolean Column over item rows (the prepare_element
analog) and the kernel is either

- a JVM Column expression (:class:`ColumnStage`) — the fast path; all
  such stages fuse into projections inside whole-stage codegen; or
- a pandas-batched Python model (:class:`PandasStage`) — the Arrow
  path for real model handles (classifier weights, tokenizers).

:func:`enrich_items` applies stages in one pass with NO joins and NO
shuffle: each stage adds one nullable column, null where the gate does
not hold. For pandas stages the gate is pushed *into* the UDF input
(``when(applies, text)`` else null) rather than wrapping the UDF in a
CASE — Spark extracts pandas UDFs out of conditional expressions and
would evaluate them on every row, so nulling the input is what actually
keeps the model from running on non-gated rows. Kernels therefore see a
pre-masked batch and must map null → null, exactly the
prepare_element contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docling_spark.operators.textstats import lang_id, quality_score, token_count


@dataclass(frozen=True)
class ColumnStage:
    """JVM-side enrichment: ``expr`` evaluated where ``applies`` holds."""

    name: str
    applies: Column
    expr: Column


@dataclass(frozen=True)
class PandasStage:
    """Arrow-batched model enrichment: ``fn(series) -> series`` over the
    gated input column (already masked to null outside the gate)."""

    name: str
    applies: Column
    input_col: str
    fn: Callable[[pd.Series], pd.Series]
    dtype: str = "double"


def enrich_items(items: DataFrame, stages: list) -> DataFrame:
    """Apply enrichment stages to the items table in one projection pass."""
    out = items
    for st in stages:
        if isinstance(st, ColumnStage):
            out = out.withColumn(st.name, F.when(st.applies, st.expr))
        elif isinstance(st, PandasStage):
            udf = F.pandas_udf(st.fn, st.dtype)
            masked = F.when(st.applies, F.col(st.input_col))
            out = out.withColumn(st.name, udf(masked))
        else:  # pragma: no cover - defensive
            raise TypeError(f"unknown stage type: {type(st).__name__}")
    return out


# ---------------------------------------------------------------------------
# shipped stages (mirrors of the reference's enrichment models)


_TEXTUAL = ("text", "paragraph", "list_item", "section_header", "title")


def token_count_stage(text_col: str = "text") -> ColumnStage:
    """Token counts for textual items (the reference computes these in
    its profiling/chunking paths)."""
    return ColumnStage(
        "n_tokens",
        F.col("label").isin(*_TEXTUAL),
        token_count(F.col(text_col)).cast("int"),
    )


def lang_id_stage(text_col: str = "text") -> ColumnStage:
    """Stopword-vote language ID over textual items."""
    return ColumnStage(
        "lang", F.col("label").isin(*_TEXTUAL), lang_id(F.col(text_col)))


def quality_stage(text_col: str = "text") -> ColumnStage:
    """rate_text_quality analog over textual items
    (page_preprocessing_model.py:30-35)."""
    return ColumnStage(
        "quality",
        F.col("label").isin(*_TEXTUAL),
        quality_score(F.col(text_col)),  # already rounded to 6 decimals
    )


def _code_score_kernel(s: pd.Series) -> pd.Series:
    """Deterministic stand-in for a code-classifier model head: first
    md5 byte of the text scaled to [0, 1]. Null in → null out (the
    gate contract). Replace ``fn`` with a real model for production."""
    import hashlib

    def one(v):
        if v is None:
            return None
        d = hashlib.md5(str(v).encode()).digest()
        return round(d[0] / 255.0, 6)

    return s.map(one)


def code_score_stage(text_col: str = "text") -> PandasStage:
    """Model-shaped stage gated to code items (the reference's
    CodeUnderstandingModel slot): Arrow-batched, null outside the gate."""
    return PandasStage(
        "code_score", F.col("label") == "code", text_col, _code_score_kernel)


def default_stages(text_col: str = "text") -> list:
    return [
        token_count_stage(text_col),
        lang_id_stage(text_col),
        quality_stage(text_col),
        code_score_stage(text_col),
    ]
