"""Full-page-picture filter + selectable cluster sort modes
(layout_postprocessor.py:328-337, 675-701 ports)."""

from __future__ import annotations

import json

from docling_spark.engine.layoutx import (
    drop_full_page_pictures,
    extract_layout,
    parse_payload,
    sort_clusters,
)


def _cell(l, t, r, b, text="x", label="text", page=1, conf=1.0):
    return {"page_no": page, "bbox": (l, t, r, b), "text": text,
            "conf": conf, "label": label, "index": 0}


def _payload(objs):
    return "\n".join(json.dumps(o) for o in objs)


def test_page_size_line_parsed():
    cells, sizes = parse_payload(_payload([
        {"page_no": 1, "width": 612, "height": 792},
        {"page_no": 1, "bbox": [0, 0, 100, 20], "text": "hello"},
    ]))
    assert sizes == {1: (612.0, 792.0)}
    assert len(cells) == 1 and cells[0]["index"] == 0


def test_full_page_picture_dropped_with_declared_box():
    cells = [
        _cell(0, 0, 600, 780, text="", label="picture"),
        _cell(10, 10, 200, 30, text="body"),
    ]
    kept = drop_full_page_pictures(cells, {1: (612.0, 792.0)})
    assert [c["label"] for c in kept] == ["text"]


def test_small_picture_kept():
    cells = [
        _cell(0, 0, 100, 100, text="", label="picture"),
        _cell(10, 200, 200, 220, text="body"),
    ]
    kept = drop_full_page_pictures(cells, {1: (612.0, 792.0)})
    assert [c["label"] for c in kept] == ["picture", "text"]


def test_content_extent_fallback():
    # no page box: the picture spans the whole content extent -> dropped
    cells = [
        _cell(0, 0, 500, 700, text="", label="picture"),
        _cell(10, 10, 490, 30, text="body"),
    ]
    kept = drop_full_page_pictures(cells, None)
    assert [c["label"] for c in kept] == ["text"]


def test_extract_layout_end_to_end():
    text, items, _ = extract_layout(_payload([
        {"page_no": 1, "width": 612, "height": 792},
        {"page_no": 1, "bbox": [0, 0, 612, 792], "text": "",
         "label": "picture"},
        {"page_no": 1, "bbox": [50, 40, 300, 60], "text": "Title here",
         "label": "title"},
        {"page_no": 1, "bbox": [50, 100, 200, 180], "text": "",
         "label": "picture"},
        {"page_no": 1, "bbox": [50, 200, 300, 220], "text": "body text"},
    ]))
    assert text == "# Title here\n\n<!-- image -->\n\nbody text"
    assert [it["label"] for it in items[1:]] == ["title", "picture", "text"]


def test_sort_clusters_modes():
    a = dict(_cell(300, 10, 400, 30), index=0)  # right column, top
    b = dict(_cell(10, 20, 100, 40), index=2)   # left column, lower
    c = dict(_cell(10, 5, 100, 15), index=1)    # left column, highest
    cells = [a, b, c]
    assert [x["index"] for x in sort_clusters(cells, "id")] == [0, 1, 2]
    assert [x["index"] for x in sort_clusters(cells, "tblr")] == [1, 0, 2]
    assert [x["index"] for x in sort_clusters(cells, "lrtb")] == [1, 2, 0]
    assert sort_clusters(cells, "nope") == cells


class TestParsePayloadFastPathGuards:
    """The JSONL fast path (one array parse) must never accept a payload
    the per-line path would reject — splices across lines can preserve
    the element count while corrupting cell text."""

    def test_spliced_string_rejected(self):
        import pytest

        from docling_spark.engine.layoutx import LayoutError, parse_payload

        # line 1's unterminated string would absorb the joining comma and
        # line 2; line 3 holds two objects to compensate the count
        payload = (
            '{"bbox":[0,0,1,1],"text":"a\n'
            'b"}\n'
            '{"width":10,"height":10},{"width":10,"height":10}'
        )
        with pytest.raises(LayoutError):
            parse_payload(payload)

    def test_legit_text_with_brace_comma_still_parses(self):
        from docling_spark.engine.layoutx import parse_payload

        # '},{' inside a legit string routes to the per-line path and
        # must still parse byte-identically
        payload = (
            '{"page_no":1,"width":100,"height":100}\n'
            '{"bbox":[0,0,5,5],"text":"a},{b"}'
        )
        cells, sizes = parse_payload(payload)
        assert cells[0]["text"] == "a},{b"
        assert sizes[1] == (100.0, 100.0)

    def test_normal_payload_unchanged(self):
        from docling_spark.engine.layoutx import parse_payload

        payload = (
            '{"page_no":1,"width":100,"height":100}\n'
            '{"bbox":[0,0,5,5],"text":"hello"}\n'
            '{"bbox":[0,6,5,11],"text":"world"}'
        )
        cells, _ = parse_payload(payload)
        assert [c["text"] for c in cells] == ["hello", "world"]
