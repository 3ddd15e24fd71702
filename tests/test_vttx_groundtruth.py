"""WebVTT engine parity against the reference's own groundtruth corpus
(tests/data/webvtt/{sources,groundtruth} in /root/reference): exact md
equality AND exact item-tree (itxt) equality for every fixture — the
reference's golden-file methodology (SURVEY.md §5)."""

import pathlib

import pytest

from docling_spark.engine.extract import detect_format, extract_payload
from docling_spark.engine.vttx import extract_vtt, parse_cues, parse_timestamp

SRC = pathlib.Path("/root/reference/tests/data/webvtt/sources")
GT = pathlib.Path("/root/reference/tests/data/webvtt/groundtruth")

FIXTURES = sorted(SRC.glob("*.vtt")) if SRC.exists() else []


def _to_itxt(items) -> str:
    out = []
    for it in items:
        ind = "  " * it["level"]
        if it["label"] in ("unspecified", "inline"):
            out.append(
                f'{ind}item-{it["item_idx"]} at level {it["level"]}: '
                f'{it["label"]}: group {it["text"]}'
            )
        else:
            out.append(
                f'{ind}item-{it["item_idx"]} at level {it["level"]}: '
                f'{it["label"]}: {it["text"]}'
            )
    return "\n".join(out)


@pytest.mark.parametrize("src", FIXTURES, ids=[f.name for f in FIXTURES])
def test_vtt_md_equality(src):
    text, _items, _m = extract_vtt(src.read_text())
    assert text == (GT / (src.name + ".md")).read_text().rstrip("\n")


@pytest.mark.parametrize("src", FIXTURES, ids=[f.name for f in FIXTURES])
def test_vtt_itxt_equality(src):
    _text, items, _m = extract_vtt(src.read_text())
    assert _to_itxt(items) == (GT / (src.name + ".itxt")).read_text().rstrip("\n")


def test_timestamp_parse():
    assert parse_timestamp("00:11.000") == 11.0
    assert parse_timestamp("00:01:02.500") == 62.5
    assert parse_timestamp("04:03:00.000") == 4 * 3600 + 3 * 60


def test_cue_fields():
    cues = parse_cues(
        "WEBVTT\n\nid-1\n00:11.000 --> 00:13.000 align:right\n"
        "<v Roger>Hello there\n"
    )
    assert len(cues) == 1
    c = cues[0]
    assert (c["start"], c["end"]) == (11.0, 13.0)
    assert c["identifier"] == "id-1"
    assert c["speaker"] == "Roger"
    assert c["lines"][0] == [("Hello there", frozenset())]


def test_vtt_routing_and_containment():
    assert detect_format("WEBVTT\n\n00:00.000 --> 00:01.000\nhi") == "vtt"
    res = extract_payload("WEBVTT\n\n00:00.000 --> 00:01.000\nhi", "")
    assert res["status"] == "success"
    assert res["format"] == "vtt"
    assert res["extracted_text"] == "hi"
    # malformed timing → failure row, never a raise
    bad = extract_payload("WEBVTT\n\nnot-a-timing --> x\nhi", "vtt")
    assert bad["status"] == "failure"
    assert bad["errors"][0]["category"] == "parse_error"


def test_spans_cover_output():
    text, items, _ = extract_vtt(
        "WEBVTT\n\n00:00.000 --> 00:01.000\nalpha\n\n"
        "00:01.000 --> 00:02.000\n<i>beta</i> gamma\n"
    )
    for it in items[1:]:
        if it["span_start"] >= 0:
            assert 0 <= it["span_start"] <= it["span_end"] <= len(text)
    assert text == "alpha\n\n*beta*  gamma"
