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
