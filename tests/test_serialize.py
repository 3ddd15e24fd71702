"""DocTags / itxt serializers over the flat item table (OutputFormat
sinks). Grammar mirrors the reference doctags groundtruth: lists open
inline with the first item, one item per line; OTSL table tokens."""

from docling_spark.engine.htmlx import extract_html
from docling_spark.engine.serialize import serialize_doctags, serialize_itxt
from docling_spark.engine.vttx import extract_vtt


def test_doctags_basic():
    _, items = extract_html(
        "<h1>Doc 1</h1><p>hello world</p><ul><li>a</li><li>b</li></ul>"
        "<table><tr><th>k</th><th>v</th></tr><tr><td>1</td><td>2</td></tr>"
        "</table><pre>x=1</pre>"
    )
    assert serialize_doctags(items) == (
        "<doctag><title>Doc 1</title>\n"
        "<text>hello world</text>\n"
        "<unordered_list><list_item>a</list_item>\n"
        "<list_item>b</list_item>\n"
        "</unordered_list>\n"
        "<otsl><ched>k<ched>v<nl><fcel>1<fcel>2<nl></otsl>\n"
        "<code>x=1</code>\n"
        "</doctag>"
    )


def test_doctags_ordered_and_nested_list():
    _, items = extract_html(
        "<ol><li>first<ul><li>sub</li></ul></li><li>second</li></ol>"
    )
    dt = serialize_doctags(items)
    assert dt.startswith("<doctag><ordered_list><list_item>first"
                         "<unordered_list><list_item>sub</list_item>"
                         "</unordered_list></list_item>")
    assert "<list_item>second</list_item>" in dt


def test_doctags_table_row0_is_header():
    # the md grid intermediate always marks row 0 as header (md requires a
    # separator row — same info loss as the reference's own md export), so
    # OTSL renders row 0 as <ched> and the rest as <fcel>
    _, items = extract_html(
        "<table><tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></table>"
    )
    dt = serialize_doctags(items)
    assert "<otsl><ched>1<ched>2<nl><fcel>3<fcel>4<nl></otsl>" in dt


def test_doctags_furniture_labels():
    _, items = extract_html(
        "<div>nav</div><h1>T</h1><p>body</p><footer>fine</footer>"
    )
    dt = serialize_doctags(items)
    # furniture items keep their text label in the doctags stream
    assert "<text>nav</text>" in dt
    assert "<title>T</title>" in dt


def test_itxt_matches_vtt_reference_shape():
    _, items, _ = extract_vtt(
        "WEBVTT\n\n00:00.000 --> 00:01.000\n<v A>plain\n\n"
        "00:01.000 --> 00:02.000\n<i>it</i> tail\n"
    )
    itxt = serialize_itxt(items)
    assert itxt.splitlines()[0] == "item-0 at level 0: unspecified: group _root_"
    assert "inline: group WebVTT cue span" in itxt
    assert "  item-1 at level 1: text: plain" in itxt


def test_spark_path_exports_match_engine_path(spark):
    """The Spark items projection must carry every key the serializers
    consume: export_items over extract_turns output is byte-identical to
    serializing the raw engine items (regression: the projection
    stripped _hlevel/_marker/_start/num_rows/..., silently flattening
    heading ranks, list markers, and table shapes on the pipeline
    path)."""
    from docling_spark.engine.serialize import (
        serialize_docling_json,
        serialize_doctags,
        serialize_itxt,
    )
    from docling_spark.operators.export import export_items
    from docling_spark.operators.extract_ops import extract_turns

    html = (
        "<h1>Top</h1><p>intro</p>"
        "<h3>Deep section</h3>"
        "<ol start='3'><li>third</li><li>fourth</li></ol>"
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>a</td><td>b|c</td></tr></table>"
        "<pre><code class='language-python'>print(1)</code></pre>"
    )
    _text, engine_items = extract_html(html)
    df = spark.createDataFrame(
        [("c1", 0, "user", None, html, "html")],
        "conv_id string, turn_idx int, role string, ts timestamp, "
        "text string, tool string",
    )
    ext = extract_turns(df)
    for fmt, ser in (("doctags", serialize_doctags),
                     ("itxt", serialize_itxt),
                     ("json", serialize_docling_json)):
        got = export_items(ext, fmt=fmt).collect()[0][fmt]
        assert got == ser(engine_items), fmt


def test_json_roundtrip_explicit_list_markers():
    """Explicit list numbering ('3.', '4.' — docx numbering) must survive
    items → JSON → items: the export emits marker/enumerated and the
    import restores _marker (regression: re-imported lists re-numbered
    from 1)."""
    from docling_spark.engine.htmlx import serialize_items
    from docling_spark.engine.jsonx import extract_docling_json
    from docling_spark.engine.serialize import serialize_docling_json

    items = [
        {"item_idx": 0, "parent_idx": -1, "label": "unspecified",
         "level": 0, "text": "_root_", "content_layer": "body"},
        {"item_idx": 1, "parent_idx": 0, "label": "list", "level": 1,
         "text": "ordered list", "content_layer": "body"},
        {"item_idx": 2, "parent_idx": 1, "label": "list_item", "level": 2,
         "text": "third thing", "content_layer": "body", "_marker": "3."},
        {"item_idx": 3, "parent_idx": 1, "label": "list_item", "level": 2,
         "text": "fourth thing", "content_layer": "body", "_marker": "4."},
    ]
    md1 = serialize_items(items, layer="body")
    assert "3. third thing" in md1 and "4. fourth thing" in md1
    _text, items2, _m = extract_docling_json(serialize_docling_json(items))
    md2 = serialize_items(items2, layer="body")
    assert md2 == md1


def test_split_page_cross_page_list_keeps_structure():
    """A list whose group opened on page 1 but whose items continue on
    page 2 must render as list items inside a continuation <ul> on page
    2 — not as bare paragraphs reparented to the root."""
    from docling_spark.engine.serialize import serialize_html_split_page

    items = [
        {"item_idx": 0, "parent_idx": -1, "label": "unspecified",
         "level": 0, "text": "_root_", "content_layer": "body"},
        {"item_idx": 1, "parent_idx": 0, "label": "list", "level": 1,
         "text": "list", "content_layer": "body", "page_no": 1},
        {"item_idx": 2, "parent_idx": 1, "label": "list_item", "level": 2,
         "text": "on page one", "content_layer": "body", "page_no": 1},
        {"item_idx": 3, "parent_idx": 1, "label": "list_item", "level": 2,
         "text": "on page two", "content_layer": "body", "page_no": 2},
    ]
    html = serialize_html_split_page(items)
    page2 = html.split('data-page="2">', 1)[1]
    assert "<li>on page two</li>" in page2
    assert "<ul>" in page2


class TestSerializerReviewFixes:
    def _root(self):
        return dict(item_idx=0, parent_idx=-1, label="unspecified",
                    level=0, text="_root_", content_layer="body")

    def test_dash_data_rows_survive(self):
        from docling_spark.engine.serialize import _parse_md_grid

        body, has_header = _parse_md_grid("| a |\n| - |\n| - |\n| b |")
        assert body == [["a"], ["-"], ["b"]] and has_header

    def test_doctags_heading_level_from_hlevel(self):
        from docling_spark.engine.serialize import serialize_doctags

        items = [self._root(),
                 dict(item_idx=1, parent_idx=0, label="section_header",
                      level=1, text="Deep", content_layer="body",
                      _hlevel=3)]
        assert "section_header_level_2" in serialize_doctags(items)

    def test_formula_and_title_escaped(self):
        from docling_spark.engine.serialize import serialize_html

        items = [self._root(),
                 dict(item_idx=1, parent_idx=0, label="formula", level=1,
                      text="a < b & c", content_layer="body")]
        h = serialize_html(items, title="T&C <x>")
        assert "$$a &lt; b &amp; c$$" in h and "T&amp;C &lt;x&gt;" in h

    def test_table_in_list_item_survives_html(self):
        from docling_spark.engine.htmlx import extract_html
        from docling_spark.engine.serialize import serialize_html

        _text, items = extract_html(
            "<body><ul><li>one<table><tr><td>x</td><td>y</td></tr>"
            "</table></li></ul></body>")
        h = serialize_html(items)
        assert "<table>" in h and "<td>x</td>" in h

    def test_split_page_ordered_continuation_start(self):
        from docling_spark.engine.serialize import serialize_html_split_page

        items = [self._root(),
                 dict(item_idx=1, parent_idx=0, label="list", level=1,
                      text="ordered list", content_layer="body",
                      _start=1, page_no=1),
                 dict(item_idx=2, parent_idx=1, label="list_item", level=2,
                      text="one", content_layer="body", _marker="1.",
                      page_no=1),
                 dict(item_idx=3, parent_idx=1, label="list_item", level=2,
                      text="two", content_layer="body", _marker="2.",
                      page_no=2)]
        assert '<ol start="2">' in serialize_html_split_page(items)

    def test_empty_cell_emits_ecel(self):
        from docling_spark.engine.serialize import _otsl

        assert "<ecel>" in _otsl("| a | b |\n| - | - |\n| c |  |")
