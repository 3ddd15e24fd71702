"""VLM / OCR post-processing kernels (vlm_post.py): CodeFormula answer
cleanup (code_formula_model.py:161-283), Qwen2.5-VL smart_resize
(vlm_utils.py:26-75), tesseract orientation + box rotation
(orientation.py:9-65, ocr_utils.py:11-69). Expectations below are
hand-run through the reference's Python bodies."""

from __future__ import annotations

import math

from docling_spark.operators.vlm_post import (
    code_formula_post,
    map_tesseract_script,
    qwen_smart_resize,
    tesseract_box_rotate,
)
from pyspark.sql import functions as F


def _cf(spark, label, answer):
    df = spark.createDataFrame([(label, answer)],
                               "label string, vlm_answer string")
    r = code_formula_post(df).collect()[0]
    return r["text"], r["code_language"]


def test_code_language_extracted_and_enum_gated(spark):
    text, lang = _cf(spark, "code", "<_Python_>x = 1</code><end_of_utterance>")
    assert (text, lang) == ("x = 1", "Python")


def test_unknown_language_tag_maps_to_unknown_but_is_stripped(spark):
    text, lang = _cf(spark, "code", "<_proto_>message M {}</code>")
    assert (text, lang) == ("message M {}", "unknown")


def test_lowercase_python_is_not_an_enum_member(spark):
    # CodeLanguageLabel("python") raises -> unknown (case-sensitive)
    _, lang = _cf(spark, "code", "<_python_>x</code>")
    assert lang == "unknown"


def test_untagged_code_keeps_text_and_unknown_language(spark):
    text, lang = _cf(spark, "code", "y = 2</code>")
    assert (text, lang) == ("y = 2", "unknown")


def test_formula_strips_loc_sentinel_and_has_null_language(spark):
    text, lang = _cf(
        spark, "formula",
        " \n E=mc^2<loc_0><loc_0><loc_500><loc_500></formula><end_of_utterance>tail")
    assert (text, lang) == ("E=mc^2", None)


def test_stop_token_truncates_everything_after(spark):
    text, _ = _cf(spark, "code", "a<end_of_utterance>b</code>c")
    assert text == "a"


def _smart_resize_py(width, height, scale=1.0, max_size=None, factor=28,
                     min_pixels=200_704, max_pixels=2_500_000):
    """Verbatim re-run of vlm_utils.py:26-75 (stdlib only)."""
    mw, mh = int(width * scale), int(height * scale)
    if max_size is not None:
        md = max(mw, mh)
        if md > max_size:
            sf = max_size / md
            mw, mh = int(mw * sf), int(mh * sf)
    h_bar = round(mh / factor) * factor
    w_bar = round(mw / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((mh * mw) / max_pixels)
        h_bar = max(factor, math.floor(mh / beta / factor) * factor)
        w_bar = max(factor, math.floor(mw / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (mh * mw))
        h_bar = math.ceil(mh * beta / factor) * factor
        w_bar = math.ceil(mw * beta / factor) * factor
    return w_bar, h_bar


def test_smart_resize_matches_reference_on_all_branches(spark):
    cases = [
        (640, 480, 1.0, None),     # no-op interior
        (4000, 3000, 1.0, None),   # max_pixels shrink
        (4000, 3000, 1.0, 1024),   # longest-side clamp first
        (300, 200, 0.5, None),     # min_pixels grow
        (434, 500, 1.0, None),     # 434/28 = 15.5 -> ties-to-even (16? no: 15.5->16 even)
        (406, 500, 1.0, None),     # 406/28 = 14.5 -> half-even rounds to 14
        (30, 20, 1.0, None),       # tiny image -> min_pixels grow
        (1000000, 28, 1.0, None),  # extreme aspect -> max(factor, ...) floor
    ]
    rows = [(i, w, h, s, m) for i, (w, h, s, m) in enumerate(cases)]
    df = spark.createDataFrame(
        rows, "id int, width int, height int, scale double, max_size int")
    got = {r["id"]: (r["w_bar"], r["h_bar"])
           for r in qwen_smart_resize(df).collect()}
    for i, (w, h, s, m) in enumerate(cases):
        assert got[i] == _smart_resize_py(w, h, s, m), (i, cases[i])


def test_tesseract_script_mapping(spark):
    df = spark.createDataFrame(
        [("Katakana",), ("Hiragana",), ("Han",), ("Korean",), ("Latin",)],
        "script string")
    got = [r[0] for r in
           df.select(map_tesseract_script(F.col("script"))).collect()]
    assert got == ["Japanese", "Japanese", "HanS", "Hangul", "Latin"]


def _rot(spark, o, l=10.0, t=20.0, bw=30.0, bh=40.0,
         im_w=800.0, im_h=600.0, sc=1.0):
    df = spark.createDataFrame(
        [(o, l, t, bw, bh, im_w, im_h, sc)],
        "tess_orientation int, l double, t double, box_w double, "
        "box_h double, im_w double, im_h double, ocr_scale double")
    r = tesseract_box_rotate(df).collect()[0]
    return r["angle_ccw"], [r[f"r_{c}{i}"] for i in range(4) for c in "xy"]


def test_rotation_identity(spark):
    a, pts = _rot(spark, 0)
    # r_0 bottom-left, counterclockwise (orientation.py:19-20)
    assert a == 0 and pts == [10, 60, 40, 60, 40, 20, 10, 20]


def test_rotation_90cw_becomes_270ccw(spark):
    # tesseract 90 clockwise -> (-90) % 360 = 270 ccw (ocr_utils.py:20-32)
    a, pts = _rot(spark, 90)
    x0, y0 = 600 - 60, 10  # im_h - (t+bh), left (orientation.py:39-47)
    assert a == 270
    assert pts == [x0, y0, x0, y0 + 30, x0 + 40, y0 + 30, x0 + 40, y0]


def test_rotation_180_and_scale_divides_corners(spark):
    a, pts = _rot(spark, 180, sc=2.0)
    x0, y0 = 800 - 10, 600 - 60  # orientation.py:30-38
    exp = [x0, y0, x0 - 30, y0, x0 - 30, y0 + 40, x0, y0 + 40]
    assert a == 180 and pts == [v / 2.0 for v in exp]


def test_invalid_orientation_yields_null_row_not_error(spark):
    a, pts = _rot(spark, 45)
    assert a is None and all(p is None for p in pts)
