"""GLM legacy-JSON converter (glmx.py vs glm_utils.py:70-361): iref
resolution, caption re-attachment, table span dedup, list grouping,
furniture routing, semantic override, warning containment."""

from __future__ import annotations

import json

import pytest

from docling_spark.engine.extract import detect_format, extract_payload
from docling_spark.engine.glmx import GlmError, extract_glm


def _doc(page_elements, main_text=(), figures=(), tables=(), props=None):
    d = {
        "file-info": {"filename": "t.pdf", "document-hash": "h"},
        "page-dimensions": [{"page": 1, "width": 612.0, "height": 792.0}],
        "page-elements": page_elements,
        "main-text": list(main_text),
        "figures": list(figures),
        "tables": list(tables),
    }
    if props is not None:
        d["properties"] = props
    return json.dumps(d)


def _pe(i, name, ptype="paragraph", span=(0, 4096), iref=None, page=1):
    return {"type": ptype, "name": name, "span": list(span),
            "iref": iref or f"#/main-text/{i}", "page": page,
            "bbox": [0.0, 0.0, 100.0, 10.0]}


def test_heading_paragraph_and_list_grouping():
    payload = _doc(
        [_pe(0, "section_header"), _pe(1, "text"),
         _pe(2, "list_item"), _pe(3, "list_item")],
        main_text=[{"text": "Intro"}, {"text": "Body para."},
                   {"text": "first"}, {"text": "second"}],
    )
    text, items, metrics = extract_glm(payload)
    assert text == "## Intro\n\nBody para.\n\n- first\n- second"
    assert metrics["parse_score"] == 1.0 and metrics["pages_parsed"] == 1
    # one list group holding both items (glm_utils.py:295-302)
    lists = [it for it in items if it["label"] == "list"]
    assert len(lists) == 1
    assert sum(1 for it in items
               if it["parent_idx"] == lists[0]["item_idx"]) == 2


def test_non_list_element_closes_the_open_list():
    payload = _doc(
        [_pe(0, "list_item"), _pe(1, "text"), _pe(2, "list_item")],
        main_text=[{"text": "a"}, {"text": "break"}, {"text": "b"}],
    )
    _, items, _ = extract_glm(payload)
    assert sum(1 for it in items if it["label"] == "list") == 2


def test_span_slices_the_referenced_text():
    payload = _doc([_pe(0, "text", span=(0, 4))],
                   main_text=[{"text": "HEADrest"}])
    text, _, _ = extract_glm(payload)
    assert text == "HEAD"


def test_figure_caption_reattached_and_top_level_caption_skipped():
    pe = [
        _pe(0, "picture", ptype="figure", iref="#/figures/0"),
        # the caption's own page-element is skipped (glm_utils.py:106-112)
        _pe(1, "caption", iref="#/figures/0/captions/0", span=(0, 8)),
    ]
    figures = [{
        "captions": [{"text": "Figure 1: flow",
                      "prov": [{"$ref": "#/page-elements/1"}]}],
        "payload": None,
    }]
    text, items, metrics = extract_glm(_doc(pe, figures=figures))
    # caption sliced by the page-element span [0,8) -> 'Figure 1'
    assert text == "Figure 1\n\n<!-- image -->"
    pic = next(it for it in items if it["label"] == "picture")
    assert items[pic["_cap_ref"]]["label"] == "caption"


def test_table_grid_dedups_spanned_cells():
    cell = {"bbox": None, "text": "W", "type": "col_header",
            "spans": [[0, 0]], "row-span": [0, 1], "col-span": [0, 2]}
    # the same spanned cell appears twice in the grid (once per covered
    # column) -> dedup by spans tuple (glm_utils.py:55-67)
    tables = [{"#-rows": 2, "#-cols": 2, "captions": [],
               "data": [[cell, cell],
                        [{"bbox": None, "text": "a", "type": "body",
                          "spans": [[1, 0]], "row-span": [1, 2],
                          "col-span": [0, 1]},
                         {"bbox": None, "text": "b", "type": "body",
                          "spans": [[1, 1]], "row-span": [1, 2],
                          "col-span": [1, 2]}]]}]
    pe = [_pe(0, "table", ptype="table", iref="#/tables/0")]
    text, items, _ = extract_glm(_doc(pe, tables=tables))
    assert text == "| W | W |\n| - | - |\n| a | b |"
    tbl = next(it for it in items if it["label"] == "table")
    assert (tbl["num_rows"], tbl["num_cols"]) == (2, 2)


def test_formula_and_furniture_routing():
    pe = [_pe(0, "formula"), _pe(1, "page_footer"), _pe(2, "text")]
    payload = _doc(pe, main_text=[{"text": "x^2"}, {"text": "p. 3"},
                                  {"text": "body"}])
    text, items, _ = extract_glm(payload)
    # formula text empty, source kept in _raw (glm_utils.py:311-314);
    # footer in furniture layer -> not rendered
    assert text == "<!-- formula-not-decoded -->\n\nbody"
    f = next(it for it in items if it["label"] == "formula")
    assert f["text"] == "" and f["_raw"] == "x^2"
    foot = next(it for it in items if it["label"] == "page_footer")
    assert foot["content_layer"] == "furniture"


def test_semantic_property_override_needs_flag_and_confidence():
    props = {"headers": ["type", "subj_path", "label", "confidence"],
             "data": [["semantic", "#/main-text/0", "caption", 0.99],
                      ["semantic", "#/main-text/1", "caption", 0.5]]}
    pe = [_pe(0, "text"), _pe(1, "text")]
    payload = _doc(pe, main_text=[{"text": "hi"}, {"text": "lo"}],
                   props=props)
    _, items_off, _ = extract_glm(payload)
    assert all(it["label"] != "caption" for it in items_off)
    _, items_on, _ = extract_glm(payload, update_name_label=True)
    labels = {it["text"]: it["label"] for it in items_on[1:]}
    assert labels["hi"] == "caption"      # conf 0.99 > 0.85
    assert labels["lo"] == "text"         # conf 0.5 rejected


def test_unresolved_iref_is_warning_not_failure():
    pe = [_pe(0, "text"), _pe(1, "text", iref="#/main-text/99")]
    payload = _doc(pe, main_text=[{"text": "kept"}])
    text, _, metrics = extract_glm(payload)
    assert text == "kept"
    assert metrics["parse_score"] == 0.5


def test_detect_and_route_through_extract_payload():
    payload = _doc([_pe(0, "section_header")], main_text=[{"text": "T"}])
    assert detect_format(payload) == "glm_json"
    assert detect_format("x", tool="glm") == "glm_json"
    res = extract_payload(payload)
    assert res["status"] == "success" and res["format"] == "glm_json"
    assert res["extracted_text"] == "## T"


def test_malformed_payload_contained():
    res = extract_payload('{"file-info": {}, "page-elements": "nope"',
                          tool="glm")
    assert res["status"] == "failure"
    assert res["errors"][0]["category"] == "parse_error"
    with pytest.raises(GlmError):
        extract_glm('{"not": "glm"}')


def test_short_span_lists_degrade_not_raise():
    pe = [_pe(0, "table", ptype="table", iref="#/tables/0")]
    tables = [{"#-rows": 1, "#-cols": 1, "captions": [],
               "data": [[{"bbox": None, "text": "x", "type": "body",
                          "spans": [[0, 0]],
                          "row-span": [0], "col-span": None}]]}]
    text, items, metrics = extract_glm(_doc(pe, tables=tables))
    # degenerate spans place no text, but the document still parses
    assert any(it["label"] == "table" for it in items)
