"""Enrichment-stage interface semantics (operators/enrich.py).

Pins the prepare_element gate contract: Column stages are null outside
their gate, the pandas model stage receives a pre-masked batch (null
input → null output), and the whole pass adds no shuffle.
"""

import pandas as pd
from pyspark.sql import functions as F

from docling_spark.operators.enrich import (
    ColumnStage,
    PandasStage,
    default_stages,
    enrich_items,
)


def _items(spark):
    return spark.createDataFrame(
        [
            (1, 0, "text", "the quick brown fox jumps over the lazy dog"),
            (1, 1, "code", "print(1)"),
            (1, 2, "picture", ""),
        ],
        "doc_id int, item_idx int, label string, text string",
    )


def test_gates_null_outside(spark):
    out = enrich_items(_items(spark), default_stages())
    rows = {r.item_idx: r for r in out.collect()}
    assert rows[0].n_tokens == 9 and rows[0].lang == "en"
    assert rows[0].code_score is None
    assert rows[1].n_tokens is None and rows[1].lang is None
    assert rows[1].code_score is not None
    assert rows[2].n_tokens is None and rows[2].code_score is None


def test_pandas_stage_sees_masked_batch(spark, tmp_path):
    # the kernel runs in the Python worker process, so record what it
    # received through a side-channel file, not a driver-side list
    marker = tmp_path / "seen.txt"

    def kernel(s: pd.Series) -> pd.Series:
        with open(marker, "a") as f:
            for v in s:
                f.write(("NULL" if v is None else str(v)) + "\n")
        return s.map(lambda v: None if v is None else 1.0)

    st = PandasStage("flag", F.col("label") == "code", "text", kernel)
    out = enrich_items(_items(spark), [st]).collect()
    flags = {r.item_idx: r.flag for r in out}
    assert flags == {0: None, 1: 1.0, 2: None}
    seen = set(marker.read_text().splitlines())
    # only the gated row's text reaches the model un-masked
    assert seen == {"NULL", "print(1)"}


def test_no_shuffle_added(spark):
    from tests.planutils import formatted_plan

    out = enrich_items(_items(spark), default_stages())
    assert "Exchange" not in formatted_plan(spark, out)


def test_column_stage_composes(spark):
    st = ColumnStage("upper", F.col("label") == "text",
                     F.upper(F.col("text")))
    out = enrich_items(_items(spark), [st]).collect()
    vals = {r.item_idx: r.upper for r in out}
    assert vals[0].startswith("THE QUICK") and vals[1] is None
