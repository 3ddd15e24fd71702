"""Templated KV extraction (DocumentExtractor.extract analog,
document_extractor.py:127-146 / extraction_vlm_pipeline.py:96-141):
per-page field capture, typed coercion, first-match-wins, default-prompt
mode, and the broadcast plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_spark.operators.template_extract import (
    extract_templated,
    template_dim,
)


TEMPLATE = {
    "Invoice No": "int",
    "Customer Name": "str",
    "Total Amount": "float",
    "Paid": "bool",
    "Ship Date": "date",
    "PO Number": "str",   # absent from the payload -> no rows
}


def _df(spark, text):
    return spark.createDataFrame(
        [("c1", 0, text)], "conv_id string, turn_idx int, extracted_text string"
    )


def test_typed_fields_single_page(spark):
    text = (
        "Invoice No: 42\n"
        "customer_name = Ada Lovelace\n"
        "TOTAL-AMOUNT: 19.5\n"
        "Paid: yes\n"
        "Ship Date: 2026-03-07\n"
        "free text line without separator\n"
    )
    rows = {r["field"]: r for r in
            extract_templated(_df(spark, text), TEMPLATE).collect()}
    assert set(rows) == {"invoice no", "customer name", "total amount",
                         "paid", "ship date"}
    assert rows["invoice no"]["value"] == "42"
    assert rows["customer name"]["value"] == "Ada Lovelace"
    assert rows["total amount"]["value"] == "19.500000"
    assert rows["paid"]["value"] == "true"
    assert rows["ship date"]["value"] == "2026-03-07"
    assert all(r["ok"] for r in rows.values())
    assert all(r["page_no"] == 1 for r in rows.values())


def test_coercion_failure_keeps_raw_with_ok_false(spark):
    # extraction_vlm_pipeline.py:115-119 — unparseable values keep the raw
    # text and are flagged, never dropped or raised.
    text = "Invoice No: not-a-number\nPaid: maybe\n"
    rows = {r["field"]: r for r in
            extract_templated(_df(spark, text), TEMPLATE).collect()}
    assert rows["invoice no"]["value"] is None
    assert rows["invoice no"]["value_raw"] == "not-a-number"
    assert rows["invoice no"]["ok"] is False
    assert rows["paid"]["ok"] is False


def test_first_match_per_page_and_page_split(spark):
    # form-feed page breaks; each page reports its own first match
    text = "Invoice No: 1\nInvoice No: 999\n\fInvoice No: 2\n"
    rows = extract_templated(_df(spark, text), TEMPLATE).collect()
    got = {(r["page_no"], r["value"]) for r in rows}
    assert got == {(1, "1"), (2, "2")}


def test_default_prompt_mode_returns_all_kv(spark):
    # template=None == the reference's default "extract everything" prompt
    # (extraction_vlm_pipeline.py:93-94)
    text = "Alpha: one\nBeta Gamma = two\n"
    rows = {r["field"]: r["value"] for r in
            extract_templated(_df(spark, text), None).collect()}
    assert rows == {"alpha": "one", "beta gamma": "two"}


def test_unsupported_type_rejected(spark):
    with pytest.raises(ValueError, match="unsupported template types"):
        template_dim(spark, {"x": "complex128"})


def test_plan_broadcasts_template_dim(spark):
    """The template join must be a broadcast, never a shuffle join — the
    dim is a handful of rows against 10^12 turns."""
    plan = extract_templated(
        _df(spark, "Invoice No: 1"), TEMPLATE
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
