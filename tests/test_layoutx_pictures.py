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


class TestLayoutRobustnessFixes:
    """Regression tests for the layout review findings."""

    def test_corrupt_giant_bbox_bounded_time(self):
        import time

        from docling_spark.engine.layoutx import dedup_cells

        # >48 cells routes to the grid path; one corrupt 1e6-coordinate
        # bbox used to enumerate (coord/side)^2 buckets (quadratic in
        # magnitude — minutes to hours); the span cap bounds it
        cells = [
            {"page_no": 1, "bbox": (float(i % 8) * 70, float(i // 8) * 20,
                                    float(i % 8) * 70 + 60,
                                    float(i // 8) * 20 + 12),
             "text": f"c{i}", "conf": 1.0, "label": "text", "index": i}
            for i in range(60)
        ]
        cells.append({"page_no": 1, "bbox": (0.0, 0.0, 1e6, 1e6),
                      "text": "corrupt", "conf": 1.0, "label": "text",
                      "index": 60})
        t0 = time.perf_counter()
        out = dedup_cells(cells)
        assert time.perf_counter() - t0 < 5.0
        # the giant cell CONTAINS every normal cell, so the >0.8
        # containment rule removes them in its favor (bigger area wins at
        # equal conf) — the finding under test is the wall-time bound,
        # not the keep/remove outcome
        assert len(out) == 1

    def test_nan_infinity_bbox_raises_layout_error(self):
        import pytest

        from docling_spark.engine.layoutx import LayoutError, parse_payload

        for bad in ('{"page_no":1,"bbox":[0,0,Infinity,1],"text":"x"}',
                    '{"page_no":1,"bbox":[0,0,1,NaN],"text":"x"}'):
            with pytest.raises(LayoutError):
                parse_payload(bad)

    def test_malformed_values_raise_layout_error_with_line(self):
        import pytest

        from docling_spark.engine.layoutx import LayoutError, parse_payload

        for bad in ('{"page_no":1,"width":"letter","height":792}',
                    '{"page_no":1,"bbox":[null,0,1,1],"text":"x"}',
                    '{"page_no":"x","bbox":[0,0,1,1],"text":"x"}'):
            with pytest.raises(LayoutError) as ei:
                parse_payload('{"page_no":1,"bbox":[0,0,1,1],"text":"ok"}\n'
                              + bad)
            assert "line 2" in str(ei.value)

    def test_colliding_column_lefts_append_not_overwrite(self):
        from docling_spark.engine.layoutx import _assemble_tables

        cells = [
            {"page_no": 1, "bbox": (10.0, 0.0, 40.0, 10.0), "text": "A",
             "conf": 1.0, "label": "table_cell", "index": 0},
            {"page_no": 1, "bbox": (10.04, 0.0, 70.0, 10.0), "text": "B",
             "conf": 1.0, "label": "table_cell", "index": 1},
        ]
        out = _assemble_tables(cells)
        assert out[0]["label"] == "table"
        assert "A" in out[0]["text"] and "B" in out[0]["text"]

    def test_empty_document_zero_pages(self):
        from docling_spark.engine.layoutx import extract_from_cells

        _, _, metrics = extract_from_cells([])
        assert metrics["pages_parsed"] == 0

    def test_offset_page_full_picture_dropped(self):
        from docling_spark.engine.layoutx import drop_full_page_pictures

        # content occupies [100,700]x[100,800]; the picture covers the
        # whole content region — with a (0,0)-origin extent its ratio was
        # 0.75 and it escaped the >90% rule
        cells = [
            {"page_no": 1, "bbox": (100.0, 100.0, 700.0, 110.0),
             "text": "t", "conf": 1.0, "label": "text", "index": 0},
            {"page_no": 1, "bbox": (100.0, 790.0, 700.0, 800.0),
             "text": "b", "conf": 1.0, "label": "text", "index": 1},
            {"page_no": 1, "bbox": (100.0, 100.0, 700.0, 800.0),
             "text": "", "conf": 1.0, "label": "picture", "index": 2},
        ]
        out = drop_full_page_pictures(cells)
        assert all(c["label"] != "picture" for c in out)
