"""VTT / YAML / DCLX export sinks."""

from __future__ import annotations

import base64
import io
import zipfile

import pytest

from docling_spark.engine.htmlx import extract_html
from docling_spark.operators.export import (
    _serialize_dclx_b64,
    _serialize_yaml,
)


def test_vtt_export_roundtrip(spark) -> None:  # noqa: F811
    from docling_spark.engine.vttx import extract_vtt
    from docling_spark.operators.export import conversations_to_vtt

    turns = spark.createDataFrame(
        [
            ("c1", 0, "user", "hello\nworld"),
            ("c1", 1, "assistant", "hi there"),
            ("c2", 0, "user", "solo"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    rows = {r["conv_id"]: r for r in
            conversations_to_vtt(turns).collect()}
    assert rows["c1"]["n_cues"] == 2
    vtt = rows["c1"]["vtt_text"]
    assert vtt.startswith("WEBVTT\n\n00:00:00.000 --> 00:00:05.000\n")
    assert "<v user>hello world" in vtt  # newline flattened
    assert "00:00:05.000 --> 00:00:10.000\n<v assistant>hi there" in vtt
    # the sink's output re-parses with our own VTT engine
    text, items, metrics = extract_vtt(vtt)
    dialogue = [it for it in items if it["label"] == "text"]
    assert [it["text"] for it in dialogue] == ["hello world", "hi there"]


def test_vtt_export_null_role_keeps_cue(spark) -> None:  # noqa: F811
    """A null role must not null (and thus silently drop) the whole cue
    while n_cues still counts it — regression for the coalesce fix."""
    from docling_spark.operators.export import conversations_to_vtt

    turns = spark.createDataFrame(
        [("c1", 0, None, "content survives")],
        "conv_id string, turn_idx int, role string, text string",
    )
    row = conversations_to_vtt(turns).collect()[0]
    assert row["n_cues"] == 1
    assert "<v speaker>content survives" in row["vtt_text"]


def test_export_items_empty_is_valid_per_format(spark) -> None:  # noqa: F811
    """items == [] (failed/timeout extraction) must render each format's
    own empty-document representation, not '' (json.loads('') raises)."""
    import json

    from docling_spark.operators.export import export_items

    df = spark.createDataFrame(
        [("c1", 0, [])],
        "conv_id string, turn_idx int, items array<struct<"
        "item_idx:int,parent_idx:int,label:string,level:int,"
        "text:string,content_layer:string>>",
    )
    out = export_items(df, fmt="json").collect()[0]["json"]
    doc = json.loads(out)
    assert doc["schema_name"] == "DoclingDocument"


def test_vtt_export_segmented_fold_matches_single(spark) -> None:  # noqa: F811
    from docling_spark.operators.export import conversations_to_vtt

    turns = spark.createDataFrame(
        [("c1", i, "user", f"turn {i}") for i in range(10)],
        "conv_id string, turn_idx int, role string, text string",
    )
    a = conversations_to_vtt(turns, segment_size=3).collect()[0]
    b = conversations_to_vtt(turns, segment_size=1024).collect()[0]
    assert a["vtt_text"] == b["vtt_text"]
    assert a["n_cues"] == 10


def test_yaml_export_same_tree_as_json() -> None:
    import json

    import yaml

    from docling_spark.engine.serialize import serialize_docling_json

    _t, items = extract_html("<h1>T</h1><p>body</p><ul><li>x</li></ul>")
    y = _serialize_yaml(items)
    assert yaml.safe_load(y) == json.loads(serialize_docling_json(items))


def test_dclx_export_roundtrip() -> None:
    from docling_spark.engine.doclangx import extract_doclang

    text1, items = extract_html("<h1>T</h1><p>body</p>")
    b64 = _serialize_dclx_b64(items)
    payload = base64.b64decode(b64)
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        assert z.namelist() == ["document.dclg"]
    text2, _items, _m = extract_doclang(payload)
    assert text2 == text1
