"""Deterministic post-processing around stubbed VLM / OCR model
boundaries — three kernels the reference runs AFTER inference, each
re-expressed as pure JVM column expressions (whole-stage codegen, no
Python in the hot path):

1. :func:`code_formula_post` — the CodeFormula enrichment model's
   answer cleanup + ``<_language_>`` extraction
   (models/stages/code_formula/code_formula_model.py:161-283).
2. :func:`qwen_smart_resize` — the Qwen2.5-VL ``smart_resize`` image
   budget arithmetic (utils/vlm_utils.py:26-75).
3. :func:`tesseract_box_rotate` — tesseract orientation parsing + the
   0/90/180/270 bounding-box rotation into corner rectangles
   (utils/orientation.py:9-65, utils/ocr_utils.py:9-69).

In every case the model/tool output itself (generated tokens, the page
raster, tesseract's OSD) is the stubbed boundary: it arrives as a
column, exactly how dotsx/deepseekx/charts treat VLM layout answers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# docling-core's CodeLanguageLabel values (types/doc/labels.py, public
# docling-core package): the CodeFormula model maps its extracted
# language tag through CodeLanguageLabel(value) and falls back to
# "unknown" on ValueError (code_formula_model.py:192-214). Exact,
# case-sensitive membership — "python" is NOT a member, "Python" is.
CODE_LANGUAGE_LABELS: tuple[str, ...] = (
    "Ada", "Awk", "Bash", "bc", "C", "C#", "C++", "CMake", "COBOL",
    "CSS", "Ceylon", "Clojure", "Crystal", "Cuda", "Cython", "D",
    "Dart", "dc", "Dockerfile", "Elixir", "Erlang", "FORTRAN", "Forth",
    "Go", "HTML", "Haskell", "Haxe", "Java", "JavaScript", "JSON",
    "Julia", "Kotlin", "Lisp", "Lua", "Matlab", "MoonScript", "Nim",
    "OCaml", "ObjectiveC", "Octave", "PHP", "Pascal", "Perl", "Prolog",
    "Python", "Racket", "Ruby", "Rust", "SML", "SQL", "Scala",
    "Scheme", "Swift", "TypeScript", "unknown", "VisualBasic", "XML",
    "YAML", "latex", "tikz",
)

# code_formula_model.py:253-276 (_post_process): truncate at the stop
# token, then strip these exact substrings, then lstrip.
_STOP_TOKEN = "<end_of_utterance>"
_REMOVE_TOKENS = ("</code>", "</formula>", "<loc_0><loc_0><loc_500><loc_500>")
_LANG_TAG = r"^<_([^_>]+)_>"  # code_formula_model.py:161-189


def code_formula_post(
    df: DataFrame,
    answer_col: str = "vlm_answer",
    label_col: str = "label",
) -> DataFrame:
    """Adds ``text`` and ``code_language`` from a raw CodeFormula VLM
    answer, mirroring __call__'s tail (code_formula_model.py:283-344):

    - ``_post_process``: cut at ``<end_of_utterance>``, remove
      ``</code>`` / ``</formula>`` / the loc sentinel, lstrip (:253-276)
    - code items only: pop a leading ``<_language_>`` tag into
      ``code_language`` via exact enum membership, else "unknown"
      (:161-214); formula items keep ``code_language`` null.
    """
    ans = F.col(answer_col)
    cleaned = F.element_at(F.split(ans, _STOP_TOKEN, 2), 1)
    for tok in _REMOVE_TOKENS:
        cleaned = F.replace(cleaned, F.lit(tok), F.lit(""))
    cleaned = F.regexp_replace(cleaned, r"^\s+", "")

    is_code = F.col(label_col) == "code"
    lang_raw = F.regexp_extract(cleaned, _LANG_TAG, 1)
    tagged = is_code & (lang_raw != "")
    return df.withColumns({
        "text": F.when(tagged, F.regexp_replace(cleaned, _LANG_TAG + r"\s*", ""))
                 .otherwise(cleaned),
        "code_language": F.when(
            is_code,
            F.when(lang_raw.isin(*CODE_LANGUAGE_LABELS), lang_raw)
             .otherwise("unknown"),
        ),
    })


def _round_half_even(x: Column) -> Column:
    """Python round() = IEEE half-even; Spark's bround matches it."""
    return F.bround(x)


def qwen_smart_resize(
    df: DataFrame,
    width_col: str = "width",
    height_col: str = "height",
    scale_col: str = "scale",
    max_size_col: str = "max_size",
    factor: int = 28,
    min_pixels: int = 200_704,
    max_pixels: int = 2_500_000,
) -> DataFrame:
    """Adds ``w_bar`` / ``h_bar`` (bigint): the post-smart_resize image
    resolution per utils/vlm_utils.py:26-75 — scale, optional
    longest-side clamp, round-to-factor (ties-to-even, Python round),
    then pixel-budget re-fit (floor for the max clamp with a
    ``factor`` floor, ceil for the min clamp).

    All double arithmetic (division, sqrt) is IEEE on both Spark and
    any SQL oracle, so results are bit-reproducible; Python's int()
    truncation on positive values maps to floor().
    """
    w = F.col(width_col).cast("double")
    h = F.col(height_col).cast("double")
    s = F.col(scale_col).cast("double")
    mw = F.floor(w * s)  # int(width * scale), positive → floor
    mh = F.floor(h * s)

    max_size = F.col(max_size_col).cast("double")
    max_dim = F.greatest(mw, mh).cast("double")
    sf = max_size / max_dim
    clamp = max_size.isNotNull() & (max_dim > max_size)
    mw = F.when(clamp, F.floor(mw * sf)).otherwise(mw).cast("double")
    mh = F.when(clamp, F.floor(mh * sf)).otherwise(mh).cast("double")

    fac = F.lit(float(factor))
    h_bar = _round_half_even(mh / fac) * factor
    w_bar = _round_half_even(mw / fac) * factor

    over = h_bar * w_bar > max_pixels
    under = h_bar * w_bar < min_pixels
    beta_over = F.sqrt(mh * mw / F.lit(float(max_pixels)))
    beta_under = F.sqrt(F.lit(float(min_pixels)) / (mh * mw))
    h_fit = F.greatest(F.lit(float(factor)), F.floor(mh / beta_over / fac) * factor)
    w_fit = F.greatest(F.lit(float(factor)), F.floor(mw / beta_over / fac) * factor)
    h_grow = F.ceil(mh * beta_under / fac) * factor
    w_grow = F.ceil(mw * beta_under / fac) * factor

    return df.withColumns({
        "h_bar": F.when(over, h_fit).when(under, h_grow).otherwise(h_bar).cast("bigint"),
        "w_bar": F.when(over, w_fit).when(under, w_grow).otherwise(w_bar).cast("bigint"),
    })


# ocr_utils.py:11-18 (map_tesseract_script)
_SCRIPT_MAP = {"Katakana": "Japanese", "Hiragana": "Japanese",
               "Han": "HanS", "Korean": "Hangul"}


def map_tesseract_script(script: Column) -> Column:
    """Tesseract OSD script name → docling lang key (ocr_utils.py:11-18)."""
    expr = script
    for src, dst in _SCRIPT_MAP.items():
        expr = F.when(script == src, dst).otherwise(expr)
    return expr


def tesseract_box_rotate(
    df: DataFrame,
    orientation_col: str = "tess_orientation",
    l_col: str = "l", t_col: str = "t",
    w_col: str = "box_w", h_col: str = "box_h",
    im_w_col: str = "im_w", im_h_col: str = "im_h",
    scale_col: str = "ocr_scale",
) -> DataFrame:
    """Adds ``angle_ccw`` and the 8 rotated-rectangle corners
    ``r_x0..r_y3`` (TOPLEFT origin, r_0 at the visual bottom-left,
    counterclockwise), mirroring:

    - ``parse_tesseract_orientation`` (ocr_utils.py:20-32): tesseract
      reports clockwise 0/90/180/270; rectangle angles are
      counterclockwise → ``(-o) % 360``;
    - ``rotate_bounding_box`` (orientation.py:9-65): per-angle corner
      arithmetic over the page size;
    - ``tesseract_box_to_bounding_rectangle`` (ocr_utils.py:35-55):
      divide every corner by the OCR raster scale.

    Invalid orientations (not multiples of 90) yield null corners —
    the reference raises; a filter on ``angle_ccw IS NULL`` recovers
    the error rows, keeping failure containment row-level as
    everywhere else in the engine.
    """
    o = F.col(orientation_col).cast("int")
    angle = (-o % 360 + 360) % 360  # Python % is floor-mod; Java's is not
    valid = o.isin(0, 90, 180, 270)

    left, top = F.col(l_col).cast("double"), F.col(t_col).cast("double")
    bw, bh = F.col(w_col).cast("double"), F.col(h_col).cast("double")
    im_w, im_h = F.col(im_w_col).cast("double"), F.col(im_h_col).cast("double")

    def corners(a):
        if a == 0:  # BoundingRectangle.from_bounding_box (orientation.py:19-20)
            return (left, top + bh, left + bw, top + bh, left + bw, top, left, top)
        if a == 90:  # orientation.py:21-29
            x0, y0 = top + bh, im_w - left
            return (x0, y0, x0, y0 - bw, x0 - bh, y0 - bw, x0 - bh, y0)
        if a == 180:  # orientation.py:30-38
            x0, y0 = im_w - left, im_h - (top + bh)
            return (x0, y0, x0 - bw, y0, x0 - bw, y0 + bh, x0, y0 + bh)
        # 270, orientation.py:39-47
        x0, y0 = im_h - (top + bh), left
        return (x0, y0, x0, y0 + bw, x0 + bh, y0 + bw, x0 + bh, y0)

    names = ("r_x0", "r_y0", "r_x1", "r_y1", "r_x2", "r_y2", "r_x3", "r_y3")
    scale = F.col(scale_col).cast("double")
    cols: dict[str, Column] = {"angle_ccw": F.when(valid, angle)}
    for i, name in enumerate(names):
        v = F.lit(None).cast("double")
        for a in (0, 90, 180, 270):
            v = F.when(valid & (angle == a), corners(a)[i] / scale).otherwise(v)
        cols[name] = v
    return df.withColumns(cols)
