"""OMML→LaTeX converter unit tests.

The groundtruth pin lives in test_docxx_groundtruth.py (the six
equation-bearing docx files are byte-exact end-to-end); these tests
cover the converter's kernel behaviors in isolation so regressions
localize.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from docling_spark.engine.ommlx import (
    omml_to_latex,
    paragraph_equations,
)

MNS = "http://schemas.openxmlformats.org/officeDocument/2006/math"
WNS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def om(inner: str) -> ET.Element:
    xml = f'<m:oMath xmlns:m="{MNS}" xmlns:w="{WNS}">{inner}</m:oMath>'
    return ET.fromstring(xml)


def r(text: str) -> str:
    return f"<m:r><m:t>{text}</m:t></m:r>"


def test_plain_run() -> None:
    assert omml_to_latex(om(r("a=b"))) == "a=b"


def test_fraction_default() -> None:
    src = ("<m:f><m:num>" + r("x") + "</m:num><m:den>" + r("y") +
           "</m:den></m:f>")
    assert omml_to_latex(om(src)) == "\\frac{x}{y}"


def test_fraction_nobar_genfrac() -> None:
    src = ('<m:f><m:fPr><m:type m:val="noBar"/></m:fPr><m:num>' + r("n") +
           "</m:num><m:den>" + r("k") + "</m:den></m:f>")
    assert omml_to_latex(om(src)) == "\\genfrac{}{}{0pt}{}{n}{k}"


def test_superscript_groups_fraction_base() -> None:
    src = ("<m:sSup><m:e><m:f><m:num>" + r("a") + "</m:num><m:den>" +
           r("b") + "</m:den></m:f></m:e><m:sup>" + r("2") +
           "</m:sup></m:sSup>")
    assert omml_to_latex(om(src)) == "{\\frac{a}{b}}^{2}"


def test_subsup() -> None:
    src = ("<m:sSubSup><m:e>" + r("N") + "</m:e><m:sub>" + r("s") +
           "</m:sub><m:sup>" + r("H") + "</m:sup></m:sSubSup>")
    assert omml_to_latex(om(src)) == "N_{s}^{H}"


def test_delimiter_defaults_and_custom() -> None:
    src = "<m:d><m:e>" + r("x") + "</m:e></m:d>"
    assert omml_to_latex(om(src)) == "\\left(x\\right)"
    src2 = ('<m:d><m:dPr><m:begChr m:val="{"/><m:endChr m:val="}"/>'
            "</m:dPr><m:e>" + r("max") + "</m:e></m:d>")
    assert omml_to_latex(om(src2)) == "\\left\\{max\\right\\}"


def test_nary_defaults_to_integral_with_empty_limits() -> None:
    src = ("<m:nary><m:naryPr/><m:sub/><m:sup/><m:e>" + r("x") +
           "</m:e></m:nary>")
    assert omml_to_latex(om(src)) == "\\int_{}^{}x"


def test_nary_sum_with_limits() -> None:
    src = ('<m:nary><m:naryPr><m:chr m:val="∑"/></m:naryPr>'
           "<m:sub>" + r("0") + "</m:sub><m:sup>" + r("2") +
           "</m:sup><m:e>" + r("x") + "</m:e></m:nary>")
    assert omml_to_latex(om(src)) == "\\sum_{0}^{2}x"


def test_func_known_name() -> None:
    src = ("<m:func><m:fName>" + r("log") + "</m:fName><m:e>" + r("x") +
           "</m:e></m:func>")
    assert omml_to_latex(om(src)) == "\\log(x)"


def test_limlow_known_and_fallback() -> None:
    src = ("<m:limLow><m:e>" + r("lim") + "</m:e><m:lim>" + r("n") +
           "</m:lim></m:limLow>")
    assert omml_to_latex(om(src)) == "\\lim_{n}"
    src2 = ("<m:limLow><m:e>" + r("unsupported") + "</m:e><m:lim>" +
            r("n") + "</m:lim></m:limLow>")
    assert omml_to_latex(om(src2)) == "unsupported_{n}"


def test_groupchr_underbrace_escapes_plain_text_lim_spaces() -> None:
    src = ("<m:limLow><m:e><m:groupChr><m:groupChrPr>"
           '<m:chr m:val="⏟"/></m:groupChrPr><m:e>' + r("S+T") +
           "</m:e></m:groupChr></m:e><m:lim>" + r("group label") +
           "</m:lim></m:limLow>")
    assert omml_to_latex(om(src)) == "\\underbrace{S+T}_{group\\ label}"


def test_dash_and_caret_stay_math_operators() -> None:
    assert omml_to_latex(om(r("x – y^2"))) == "x - y^2"


def test_symbol_padding_survives_single_collapse() -> None:
    # π renders padded "  \pi  "; the final single collapse pass leaves
    # one space on each side (groundtruth 'A= \pi r^{2}')
    assert omml_to_latex(om(r("A=πr"))) == "A= \\pi r"


def test_ellipsis_text_macro() -> None:
    assert omml_to_latex(om(r("+…"))).strip() == \
        "+ \\text{ \\textellipsis }"


def test_matrix() -> None:
    src = ("<m:m><m:mr><m:e>" + r("a") + "</m:e><m:e>" + r("b") +
           "</m:e></m:mr><m:mr><m:e>" + r("c") + "</m:e><m:e>" + r("d") +
           "</m:e></m:mr></m:m>")
    assert omml_to_latex(om(src)) == \
        "\\begin{matrix}a&b\\\\c&d\\end{matrix}"


def test_paragraph_equations_orders_fragments() -> None:
    xml = (
        f'<w:p xmlns:w="{WNS}" xmlns:m="{MNS}">'
        "<w:r><w:t>before </w:t></w:r>"
        "<m:oMath><m:r><m:t>a=b</m:t></m:r></m:oMath>"
        "<w:r><w:t> after</w:t></w:r>"
        "</w:p>"
    )
    frags = paragraph_equations(ET.fromstring(xml))
    assert frags == [("text", "before "), ("eq", "a=b"),
                     ("text", " after")]


def test_paragraph_equations_empty_without_math() -> None:
    xml = (f'<w:p xmlns:w="{WNS}"><w:r><w:t>plain</w:t></w:r></w:p>')
    assert paragraph_equations(ET.fromstring(xml)) == []


def test_paragraph_equations_deep_omathpara() -> None:
    xml = (
        f'<w:p xmlns:w="{WNS}" xmlns:m="{MNS}">'
        "<m:oMathPara><m:oMath><m:r><m:t>c=d</m:t></m:r></m:oMath>"
        "</m:oMathPara></w:p>"
    )
    frags = paragraph_equations(ET.fromstring(xml))
    assert frags == [("eq", "c=d")]
