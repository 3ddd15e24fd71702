"""Regression tests for the HTML walker/tokenizer review findings —
each case was reproduced against the reference backend's semantics
(html_backend.py) or the stdlib-parser differential oracle before the
fix, and must stay pinned."""

from __future__ import annotations

from docling_spark.engine.extract import extract_payload


def _text(html: str) -> str:
    return extract_payload(html, "html")["extracted_text"]


def _items(html: str):
    return extract_payload(html, "html")["items"]


class TestLeafImgInput:
    def test_img_direct_child_of_p_emits_picture(self):
        # the reference treats img as a block tag at any walk position
        # (html_backend.py:89-110, :1722); a leaf img inside <p> must
        # emit caption+picture exactly like a span-wrapped one
        r = _text("<body><p>text <img src='a' alt='inpara'> more</p></body>")
        assert "inpara" in r and "<!-- image -->" in r
        assert "text more" in r

    def test_img_in_p_matches_span_wrapped(self):
        a = _text("<body><p>t <img alt='cap'> m</p></body>")
        b = _text("<body><p>t <span><img alt='cap'></span> m</p></body>")
        assert a == b

    def test_checkbox_direct_child_of_p(self):
        assert _text("<body><p><input type='checkbox' checked> Done</p>"
                     "</body>") == "- [x] Done"

    def test_img_in_dd(self):
        r = _text("<body><dl><dt>term</dt><dd><img alt='pic alt'></dd>"
                  "</dl></body>")
        assert "pic alt" in r


class TestFormWalk:
    def test_plain_form_content_extracted(self):
        # the reference walks plain <form> as a generic container
        # (_PARA_BREAKERS membership only affects <p> nesting)
        assert _text("<body><form><p>Form paragraph content</p></form>"
                     "</body>") == "Form paragraph content"

    def test_form_region_class_still_uses_kv_machinery(self):
        # the class-gated form-region path is unaffected
        html = ("<body><div class='form_region'>"
                "<span data-semantic-id='key1'>Name</span>"
                "<span data-semantic-id='key1_value1'>Alice</span>"
                "</div></body>")
        labels = [it["label"] for it in _items(html)]
        assert "form_region" in labels or "Name" in _text(html)


class TestFastTokenizerCdata:
    def test_script_prefix_close_stays_in_cdata(self):
        # html.parser (the pinned oracle) stays in CDATA through
        # '</scriptx>'; the fast path must agree
        r = _text("<body><p>before<script>x</scriptx><p>inner</p>"
                  "</script>after</p></body>")
        assert r == "before after"

    def test_marked_section_cdata_skipped(self):
        assert _text("<body><p>a<![CDATA[ x > y ]]>b</p></body>") == "a b"

    def test_ms_conditional_section(self):
        # conditional sections end at ']>' (html.parser _markupbase)
        assert _text("<body><p>m<![if !IE]>n<![endif]>o</p></body>") \
            == "m n o"


class TestMenuNesting:
    def test_menu_nested_in_ul(self):
        r = _text("<body><ul><li>a</li><menu><li>kept</li></menu></ul>"
                  "</body>")
        assert "kept" in r

    def test_menu_inside_li(self):
        r = _text("<body><ul><li>a<menu><li>sub</li></menu></li></ul>"
                  "</body>")
        assert "sub" in r


class TestListSpanPairing:
    def test_caption_line_matching_marker_shape_does_not_shift_spans(self):
        out = extract_payload(
            "<body><ul><li>one<ul><li><img alt='- decorative dash'>two"
            "</li><li>three</li></ul></li></ul></body>", "html")
        txt = out["extracted_text"]
        for it in out["items"]:
            if it["label"] == "list_item" and it["span_start"] >= 0:
                assert txt[it["span_start"]:it["span_end"]] == it["text"]
