"""DocTags parser unit edges (doctagsx.py) beyond the groundtruth
corpus: stray list items, code language token, page counting, literal
angle brackets in running text, routing."""

from __future__ import annotations

from docling_spark.engine.doctagsx import extract_doctags
from docling_spark.engine.extract import detect_format, extract_payload


def test_stray_list_items_group_and_split():
    text, items, _ = extract_doctags(
        "<doctag><list_item>a</list_item><list_item>b</list_item>"
        "<text>break</text><list_item>c</list_item></doctag>")
    assert text == "- a\n- b\n\nbreak\n\n- c"
    assert sum(1 for it in items if it["label"] == "list") == 2


def test_code_language_token_extracted():
    _, items, _ = extract_doctags(
        "<doctag><code><loc_1><loc_2><loc_3><loc_4><_Python_>"
        "x = 1</code></doctag>")
    code = next(it for it in items if it["label"] == "code")
    assert code["text"] == "x = 1"
    assert code["code_language"] == "Python"


def test_unknown_language_token_dropped():
    _, items, _ = extract_doctags(
        "<doctag><code><_unknown_>y</code></doctag>")
    code = next(it for it in items if it["label"] == "code")
    assert code["text"] == "y" and "code_language" not in code


def test_page_break_counts_pages_and_tags_items():
    _, items, metrics = extract_doctags(
        "<doctag><text>p1</text><page_break><text>p2</text></doctag>")
    assert metrics["pages_parsed"] == 2
    pages = [it["page_no"] for it in items if it["label"] == "text"]
    assert pages == [1, 2]


def test_literal_angle_brackets_in_text_are_content():
    text, _, _ = extract_doctags(
        "<doctag><text>use <td> and </td> wisely</text></doctag>")
    assert text == "use &lt;td&gt; and &lt;/td&gt; wisely"


def test_underscores_escaped_outside_code_and_tables():
    text, _, _ = extract_doctags(
        "<doctag><text>VAR_NAME</text><code>VAR_NAME</code>"
        "<otsl><fcel>VAR_NAME<nl></otsl></doctag>")
    blocks = text.split("\n\n")
    assert blocks[0] == "VAR\\_NAME"
    assert "VAR_NAME" in blocks[1]          # code verbatim
    assert "| VAR_NAME |" in blocks[2]      # table cells pipe-escape only


def test_ucel_copies_cell_above():
    text, _, _ = extract_doctags(
        "<doctag><otsl><ched>h1<ched>h2<nl><fcel>a<ucel><nl></otsl>"
        "</doctag>")
    assert text == "| h1 | h2 |\n| - | - |\n| a | h2 |"


def test_routing_and_containment():
    assert detect_format("<doctag><text>x</text></doctag>") == "doctags"
    assert detect_format("x", tool="doctags") == "doctags"
    res = extract_payload("<doctag><text>hi</text></doctag>")
    assert res["status"] == "success" and res["format"] == "doctags"
    assert res["extracted_text"] == "hi"
    bad = extract_payload("no tags here", tool="doctags")
    assert bad["status"] == "failure"
    assert bad["errors"][0]["category"] == "parse_error"


def test_roundtrip_sink_to_parser_preserves_markdown():
    # serialize an extracted document to DocTags (engine/serialize.py),
    # parse it back (doctagsx), and the markdown must survive — the
    # same closure the reference gets from DocTagsDocument round-trips
    from docling_spark.engine.extract import extract_payload
    from docling_spark.engine.serialize import serialize_doctags

    html = ("<h1>Title</h1><p>Some body text.</p>"
            "<ul><li>alpha</li><li>beta</li></ul>"
            "<table><tr><th>h1</th><th>h2</th></tr>"
            "<tr><td>a</td><td>b</td></tr></table>"
            "<pre>x = 1</pre>")
    first = extract_payload(html, tool="html")
    assert first["status"] == "success"
    tags = serialize_doctags([dict(it) for it in first["items"]])
    second = extract_payload(tags, tool="doctags")
    assert second["status"] == "success"
    assert second["extracted_text"] == first["extracted_text"]


def test_multiple_doctag_blocks_are_pages():
    # the VLM pipeline emits one <doctag> block per page
    # (vlm_pipeline.py:447-465)
    _, items, metrics = extract_doctags(
        "<doctag><text>p1</text></doctag><doctag><text>p2</text></doctag>")
    assert metrics["pages_parsed"] == 2
    assert [it["page_no"] for it in items if it["label"] == "text"] == [1, 2]
