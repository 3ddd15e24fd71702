"""Form/key-value machinery unit tests (beyond the groundtruth pin).

Covers the ported selection rules from html_backend.py:2783-4380: semantic
id grouping, key-scope preference, DOM-distance tie-breaking, input-value
extraction, key text excluding consumed descendants, and the no-fields
fallback to normal block dispatch.
"""

from __future__ import annotations

from docling_spark.engine.htmlx import extract_html


def _labels(items):
    return [(it["label"], it["text"]) for it in items[1:]]


def test_basic_field_grouping_and_order():
    text, items = extract_html(
        '<div class="form_region">'
        '<div><div id="key1_marker">1</div>'
        '<span id="key1">Name</span>'
        '<span id="key1_value1">Ada</span></div>'
        '<div><span id="key2">City</span>'
        '<span id="key2_value1">Paris</span></div>'
        "</div>"
    )
    assert _labels(items) == [
        ("field_region", ""),
        ("field_item", ""),
        ("marker", "1"), ("field_key", "Name"), ("field_value", "Ada"),
        ("field_item", ""),
        ("field_key", "City"), ("field_value", "Paris"),
    ]
    assert text == (
        "<!-- missing-text -->\n\n<!-- missing-text -->\n\n1\n\nName\n\nAda"
        "\n\n<!-- missing-text -->\n\nCity\n\nParis"
    )


def test_value_indices_order_multiple_values():
    _, items = extract_html(
        '<div class="form_region"><div>'
        '<span id="key1">Tags</span>'
        '<span id="key1_value2">two</span>'
        '<span id="key1_value1">one</span>'
        "</div></div>"
    )
    vals = [t for (l, t) in _labels(items) if l == "field_value"]
    # selection ranks by value index, but emission sorts parts by document
    # order (html_backend.py:3770 sorted(parts, key=part[0]) on dom order)
    assert vals == ["two", "one"]


def test_dom_distance_prefers_same_wrapper():
    # two candidate values share index "1" via duplicated ids in sibling
    # wrappers; the one nearer the key in the DOM wins
    _, items = extract_html(
        '<div class="form_region">'
        '<div><span id="key1">K</span><span id="key1_value1">near</span></div>'
        '<div><span id="key1_value1">far</span></div>'
        "</div>"
    )
    vals = [t for (l, t) in _labels(items) if l == "field_value"]
    assert vals == ["near"]


def test_input_value_extraction():
    _, items = extract_html(
        '<div class="form_region"><div>'
        '<span id="key1">Qty</span>'
        '<input id="key1_value1" value="42"/>'
        "</div></div>"
    )
    assert ("field_value", "42") in _labels(items)


def test_key_text_excludes_nested_value():
    _, items = extract_html(
        '<div class="form_region"><div>'
        '<span id="key1">Total <span id="key1_value1">99</span></span>'
        "</div></div>"
    )
    lab = _labels(items)
    assert ("field_key", "Total") in lab
    assert ("field_value", "99") in lab


def test_no_semantic_ids_falls_back_to_normal_blocks():
    text, items = extract_html(
        '<div class="form_region"><p>just a paragraph</p></div>'
    )
    assert all(it["label"] != "field_region" for it in items)
    assert text == "just a paragraph"


def test_valueless_key_not_consumed():
    # a key with no value renders as normal walked content, not a field
    text, items = extract_html(
        '<div class="form_region"><div>'
        '<span id="key1">Orphan Label</span></div>'
        '<div><span id="key2">K</span><span id="key2_value1">v</span></div>'
        "</div>"
    )
    assert ("field_key", "Orphan Label") not in _labels(items)
    assert "Orphan Label" in text


def test_form_region_table_stays_table():
    text, _ = extract_html(
        '<table class="form_region"><tr><th>A</th><th>B</th></tr>'
        "<tr><td>1</td><td>2</td></tr></table>"
    )
    assert text.startswith("| A | B |")


def test_unicode_normalization_in_fields():
    _, items = extract_html(
        '<div class="form_region"><div>'
        '<span id="key1">Price Total</span>'
        '<span id="key1_value1">“EUR” 9–5</span>'
        "</div></div>"
    )
    lab = _labels(items)
    assert ("field_key", "Price Total") in lab
    assert ("field_value", '"EUR" 9-5') in lab
