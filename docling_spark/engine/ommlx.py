"""OMML (Office Math Markup Language) → LaTeX.

From-scratch converter for the ``m:oMath`` trees embedded in DOCX
paragraphs, built on stdlib ``xml.etree`` (the reference's converter,
docling/backend/docx/latex/omml.py, walks lxml and leans on pylatexenc
for unicode→LaTeX; neither library exists in this environment, so the
character mapping is an explicit table reproducing the same rendered
forms).  Semantics pinned byte-exact against the reference's own
groundtruth (tests/data/docx/groundtruth/equations.docx.md and the four
omml_* regression files) — see tests/test_ommlx.py.

Rendering rules that matter for byte-exactness (derived from the
groundtruth, cited against docling/backend/docx/latex/omml.py):

- a run (``m:r``) maps characters one by one; plain ASCII passes
  through, math-operator lookalikes (en/em dash, minus, caret,
  multiplication sign) map to math operators (omml.py:_MATH_CHAR_MAP),
  Greek/symbol characters render padded as ``"  \\pi  "`` (the
  ensuremath-unwrap path of omml.py:process_unicode), and text-mode
  glyphs like the ellipsis render as ``" \\text{ \\textellipsis } "``.
- the final string collapses double spaces ONCE (a single
  ``str.replace("  ", " ")`` pass, omml.py:__str__), which is why
  groundtruth keeps runs of two spaces where three were produced.
- fraction bases of sub/superscripts get grouping braces
  (omml.py:_needs_grouping).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

M = "{http://schemas.openxmlformats.org/officeDocument/2006/math}"

_ESCAPE_CHARS = frozenset("{}_^#&$%~")

# dash/caret/times render as math operators, never text-mode macros
_MATH_OPS = {
    "\u2013": "-",
    "\u2014": "-",
    "\u2212": "-",
    "\u005e": "^",
    "\u00d7": "\\times ",
}

# symbol characters that LaTeX-encode to a bare math macro; each renders
# as "  \<name>  " (both pads survive one double-space collapse as a
# single space)
_SYM = {
    # Greek lowercase
    "\u03b1": "alpha", "\u03b2": "beta", "\u03b3": "gamma",
    "\u03b4": "delta", "\u03b5": "varepsilon", "\u03f5": "epsilon",
    "\u03b6": "zeta", "\u03b7": "eta", "\u03b8": "theta",
    "\u03d1": "vartheta", "\u03b9": "iota", "\u03ba": "kappa",
    "\u03bb": "lambda", "\u03bc": "mu", "\u03bd": "nu", "\u03be": "xi",
    "\u03c0": "pi", "\u03d6": "varpi", "\u03c1": "rho",
    "\u03f1": "varrho", "\u03c3": "sigma", "\u03c2": "varsigma",
    "\u03c4": "tau", "\u03c5": "upsilon", "\u03c6": "varphi",
    "\u03d5": "phi", "\u03c7": "chi", "\u03c8": "psi", "\u03c9": "omega",
    # Greek uppercase (only the ones with LaTeX macros)
    "\u0393": "Gamma", "\u0394": "Delta", "\u0398": "Theta",
    "\u039b": "Lambda", "\u039e": "Xi", "\u03a0": "Pi",
    "\u03a3": "Sigma", "\u03a5": "Upsilon", "\u03a6": "Phi",
    "\u03a8": "Psi", "\u03a9": "Omega",
    # operators / relations
    "\u221e": "infty", "\u00b1": "pm", "\u2213": "mp",
    "\u22c5": "cdot", "\u00f7": "div", "\u2217": "ast",
    "\u2229": "cap", "\u222a": "cup", "\u2264": "leq", "\u2265": "geq",
    "\u2260": "neq", "\u2248": "approx", "\u2261": "equiv",
    "\u226a": "ll", "\u226b": "gg", "\u221d": "propto",
    "\u2208": "in", "\u2209": "notin", "\u220b": "ni",
    "\u2282": "subset", "\u2283": "supset",
    "\u2286": "subseteq", "\u2287": "supseteq",
    "\u2205": "emptyset", "\u2200": "forall", "\u2203": "exists",
    "\u00ac": "neg", "\u2227": "wedge", "\u2228": "vee",
    "\u2192": "rightarrow", "\u2190": "leftarrow",
    "\u2194": "leftrightarrow", "\u21d2": "Rightarrow",
    "\u21d0": "Leftarrow", "\u21d4": "Leftrightarrow",
    "\u2191": "uparrow", "\u2193": "downarrow",
    "\u2202": "partial", "\u2207": "nabla", "\u221a": "surd",
    "\u222b": "int", "\u2211": "sum", "\u220f": "prod",
    "\u2032": "prime", "\u2245": "cong", "\u223c": "sim",
    "\u2295": "oplus", "\u2297": "otimes", "\u22a5": "perp",
    "\u2225": "parallel", "\u2135": "aleph", "\u210f": "hbar",
    "\u2113": "ell", "\u2118": "wp", "\u211c": "Re", "\u2111": "Im",
    "\u22ef": "cdots", "\u22ee": "vdots", "\u22f1": "ddots",
}

# characters that LaTeX-encode to a text-mode macro; each renders as
# " \text{ \<name> } " (omml.py:process_unicode \text re-wrap branch)
_TEXT_MACRO = {
    "\u2026": "textellipsis",
    "\u00a9": "textcopyright",
    "\u00ae": "textregistered",
    "\u2122": "texttrademark",
    "\u00b0": "textdegree",
    "\u00a7": "textsection",
    "\u00b6": "textparagraph",
    "\u2020": "textdagger",
    "\u2021": "textdaggerdbl",
    "\u2022": "textbullet",
}

# math-alphanumeric italic letters (U+1D434..) fold to plain letters
_MATH_ALNUM_RANGES = (
    (0x1D434, ord("A")),  # italic capital
    (0x1D44E, ord("a")),  # italic small
    (0x1D400, ord("A")),  # bold capital
    (0x1D41A, ord("a")),  # bold small
    (0x1D7CE, ord("0")),  # bold digits
)

_BIG_OPS = {
    "\u2140": "\\Bbbsum", "\u220f": "\\prod", "\u2210": "\\coprod",
    "\u2211": "\\sum", "\u222b": "\\int", "\u222c": "\\iint",
    "\u222d": "\\iiint", "\u222e": "\\oint", "\u222f": "\\oiint",
    "\u2230": "\\oiiint", "\u22c0": "\\bigwedge", "\u22c1": "\\bigvee",
    "\u22c2": "\\bigcap", "\u22c3": "\\bigcup", "\u2a00": "\\bigodot",
    "\u2a01": "\\bigoplus", "\u2a02": "\\bigotimes",
}

# accent combining char → macro template (m:acc / m:groupChr chr values)
_ACCENTS = {
    "\u0300": "\\grave{%s}", "\u0301": "\\acute{%s}",
    "\u0302": "\\hat{%s}", "\u0303": "\\tilde{%s}",
    "\u0304": "\\bar{%s}", "\u0305": "\\overbar{%s}",
    "\u0306": "\\breve{%s}", "\u0307": "\\dot{%s}",
    "\u0308": "\\ddot{%s}", "\u030c": "\\check{%s}",
    "\u0338": "\\not{%s}", "\u20d7": "\\vec{%s}",
    "\u20db": "\\dddot{%s}", "\u20d6": "\\overleftarrow{%s}",
    "\u20e1": "\\overleftrightarrow{%s}",
    # group chars
    "\u23b4": "\\overbracket{%s}", "\u23dc": "\\overparen{%s}",
    "\u23de": "\\overbrace{%s}", "\u23b5": "\\underbracket{%s}",
    "\u23dd": "\\underparen{%s}", "\u23df": "\\underbrace{%s}",
}

# delimiter begChr/endChr values that need a symbol lookup before escape
_DELIM_MAP = {
    "\u2016": "\\Vert ", "\u27e8": "\\langle ", "\u27e9": "\\rangle ",
    "\u2308": "\\lceil ", "\u2309": "\\rceil ",
    "\u230a": "\\lfloor ", "\u230b": "\\rfloor ",
}

_FUNC = {
    name: "\\%s({fe})" % name
    for name in (
        "sin", "cos", "tan", "arcsin", "arccos", "arctan", "arccot",
        "sinh", "cosh", "tanh", "coth", "sec", "csc", "max", "min",
        "log", "ln", "exp", "det", "gcd", "deg", "hom", "ker", "dim",
        "arg", "inf", "sup", "lim", "Pr",
    )
}
_FUNC["mod"] = "\\mod {fe}"

_LIM_FUNC = {
    "lim": "\\lim_{%s}", "max": "\\max_{%s}", "min": "\\min_{%s}",
    "argmax": "\\operatorname{argmax}_{%s}",
    "argmin": "\\operatorname{argmin}_{%s}",
}

_GROUPING_PREFIXES = (
    "\\underbrace{", "\\overbrace{", "\\underparen{", "\\overparen{",
    "\\underbracket{", "\\overbracket{",
)

_MATHY = frozenset("\\<>=+*/^_{}")


def _loc(el: ET.Element) -> str:
    tag = el.tag
    return tag[len(M):] if tag.startswith(M) else tag


def _escape(s: str) -> str:
    """Backslash-escape LaTeX specials not already escaped."""
    s = s.replace("\\\\", "\\")
    out: list[str] = []
    last = ""
    for c in s:
        if c in _ESCAPE_CHARS and last != "\\":
            out.append("\\" + c)
        else:
            out.append(c)
        last = c
    return "".join(out)


def _char_latex(c: str) -> str:
    if c in _MATH_OPS:
        return _MATH_OPS[c]
    if c in "<>":
        # math-only ASCII: LaTeX-encodes via an \ensuremath wrapper whose
        # unwrapping leaves the two-space pads (groundtruth
        # 'e^{x}=... - \infty  < x <  \infty')
        return "  " + c + "  "
    if ord(c) < 128:
        return c
    if c in _SYM:
        return "  \\" + _SYM[c] + "  "
    if c in _TEXT_MACRO:
        return " \\text{ \\" + _TEXT_MACRO[c] + " } "
    cp = ord(c)
    for base, target in _MATH_ALNUM_RANGES:
        if base <= cp < base + 26 or (target == ord("0") and
                                      base <= cp < base + 10):
            return chr(target + cp - base)
    return c  # unknown: keep verbatim


class _Props:
    """Collected ``m:*Pr`` property values (chr/pos/begChr/endChr/type)
    plus accumulated forced line breaks (``m:brk`` → ``\\\\``)."""

    __slots__ = ("vals", "text")

    def __init__(self, el: ET.Element | None):
        self.vals: dict[str, str | None] = {}
        self.text = ""
        if el is None:
            return
        for ch in el:
            t = _loc(ch)
            if t in ("chr", "pos", "begChr", "endChr", "type"):
                self.vals[t] = ch.get(M + "val")
            elif t == "brk":
                self.text += "\\\\"

    def get(self, key: str) -> str | None:
        return self.vals.get(key)


def _conv_run(el: ET.Element) -> str:
    text = el.findtext("./" + M + "t") or ""
    if not text:
        return ""
    proc = _escape("".join(_char_latex(c) for c in text))
    # escaping artifacts: braces introduced by the mapping (not present
    # in the source) stay structural; mapped math operators that landed
    # in the escape set (the caret) are un-escaped
    if "{" not in text and "\\{" in proc:
        proc = proc.replace("\\{", "{")
    if "}" not in text and "\\}" in proc:
        proc = proc.replace("\\}", "}")
    for orig, mapped in _MATH_OPS.items():
        if mapped in _ESCAPE_CHARS and orig in text and \
                ("\\" + mapped) in proc:
            proc = proc.replace("\\" + mapped, mapped)
    return proc


def _needs_group(s: str) -> bool:
    return "\\frac" in s or "\\sqrt" in s


def _unwrap(script: str, marker: str) -> str:
    pre = marker + "{"
    if script.startswith(pre) and script.endswith("}"):
        return script[len(pre):-1]
    return script


def _children(el: ET.Element, include: tuple[str, ...] | None = None
              ) -> str:
    return "".join(
        s for _t, s in _child_list(el, include)
    )


def _child_list(el: ET.Element, include: tuple[str, ...] | None = None
                ) -> list[tuple[str, str]]:
    out = []
    for ch in el:
        if not ch.tag.startswith(M):
            continue
        t = _loc(ch)
        if include and t not in include:
            continue
        s = _conv(ch)
        if s is None:
            continue
        out.append((t, s))
    return out


def _find_pr(el: ET.Element, name: str) -> _Props:
    return _Props(el.find(M + name))


def _conv_d(el: ET.Element) -> str:
    pr = _find_pr(el, "dPr")
    body = _children(el, include=("e",))
    beg = pr.get("begChr")
    end = pr.get("endChr")
    left = "(" if beg is None else _DELIM_MAP.get(beg, beg)
    right = ")" if end is None else _DELIM_MAP.get(end, end)
    return (pr.text + "\\left" + (_escape(left) if left else ".")
            + body + "\\right" + (_escape(right) if right else "."))


def _conv_f(el: ET.Element) -> str:
    pr = _find_pr(el, "fPr")
    num = _children(el, include=("num",))
    den = _children(el, include=("den",))
    kind = pr.get("type")
    if kind == "lin":
        return pr.text + "{%s}/{%s}" % (num, den)
    if kind == "skw":
        return pr.text + "^{%s}/_{%s}" % (num, den)
    if kind == "noBar":
        return pr.text + "\\genfrac{}{}{0pt}{}{%s}{%s}" % (num, den)
    return pr.text + "\\frac{%s}{%s}" % (num, den)


def _conv_fname(el: ET.Element) -> str:
    parts = []
    for t, s in _child_list(el):
        if t == "r" and s in _FUNC:
            parts.append(_FUNC[s])
        else:
            parts.append(s)
    joined = "".join(parts)
    return joined if "{fe}" in joined else joined + "{fe}"


def _conv_func(el: ET.Element) -> str:
    name = _children(el, include=("fName",))
    body = _children(el, include=("e",))
    return name.replace("{fe}", body)


def _conv_ssub(el: ET.Element) -> str:
    base = _children(el, include=("e",)).rstrip()
    sub = _unwrap(_children(el, include=("sub",)), "_")
    if _needs_group(base):
        base = "{" + base + "}"
    return base + "_{%s}" % sub


def _conv_ssup(el: ET.Element) -> str:
    base = _children(el, include=("e",)).rstrip()
    sup = _unwrap(_children(el, include=("sup",)), "^")
    if _needs_group(base):
        base = "{" + base + "}"
    return base + "^{%s}" % sup


def _conv_ssubsup(el: ET.Element) -> str:
    base = _children(el, include=("e",)).rstrip()
    sub = _unwrap(_children(el, include=("sub",)), "_")
    sup = _unwrap(_children(el, include=("sup",)), "^")
    if _needs_group(base):
        base = "{" + base + "}"
    return base + "_{%s}" % sub + "^{%s}" % sup


def _conv_nary(el: ET.Element) -> str:
    pr = _find_pr(el, "naryPr")
    chrv = pr.get("chr")
    op = "\\int" if chrv is None else _BIG_OPS.get(chrv, chrv)
    parts = []
    for t, s in _child_list(el):
        if t == "naryPr":
            continue
        parts.append(s)
    return op + "".join(parts)


def _conv_rad(el: ET.Element) -> str:
    body = _children(el, include=("e",))
    deg = _children(el, include=("deg",))
    if deg:
        return "\\sqrt[%s]{%s}" % (deg, body)
    return "\\sqrt{%s}" % body


def _conv_acc(el: ET.Element) -> str:
    pr = _find_pr(el, "accPr")
    body = _children(el, include=("e",))
    tpl = _ACCENTS.get(pr.get("chr") or "\u0302", pr.get("chr") or "")
    return tpl % body if "%s" in tpl else tpl


def _conv_bar(el: ET.Element) -> str:
    pr = _find_pr(el, "barPr")
    body = _children(el, include=("e",))
    tpl = "\\underline{%s}" if pr.get("pos") == "bot" else "\\overline{%s}"
    return pr.text + tpl % body


def _conv_groupchr(el: ET.Element) -> str:
    pr = _find_pr(el, "groupChrPr")
    body = _children(el, include=("e",))
    chrv = pr.get("chr")
    tpl = "\\underbrace{%s}" if chrv is None else _ACCENTS.get(chrv, chrv)
    return pr.text + (tpl % body if "%s" in tpl else tpl)


def _conv_lim(el: ET.Element) -> str:
    s = _children(el).replace("\\rightarrow", "\\to").rstrip()
    if s.endswith("\\\\"):
        s = s[:-2].rstrip()
    if s and not any(c in _MATHY for c in s):
        s = s.replace(" ", "\\ ")
    return s


def _conv_limlow(el: ET.Element) -> str:
    base = _children(el, include=("e",))
    lim = _children(el, include=("lim",))
    tpl = _LIM_FUNC.get(base)
    if tpl:
        return tpl % lim
    return "%s_{%s}" % (base, lim)


def _conv_limupp(el: ET.Element) -> str:
    base = _children(el, include=("e",))
    lim = _children(el, include=("lim",))
    return "\\overset{%s}{%s}" % (lim, base)


def _conv_eqarr(el: ET.Element) -> str:
    return "\\\\".join(s for t, s in _child_list(el, include=("e",)))


def _conv_m(el: ET.Element) -> str:
    rows = [s for t, s in _child_list(el) if t == "mr"]
    return "\\begin{matrix}%s\\end{matrix}" % "\\\\".join(rows)


def _conv_mr(el: ET.Element) -> str:
    return "&".join(s for t, s in _child_list(el, include=("e",)))


_DISPATCH = {
    "r": _conv_run,
    "d": _conv_d,
    "f": _conv_f,
    "func": _conv_func,
    "fName": _conv_fname,
    "sSub": _conv_ssub,
    "sSup": _conv_ssup,
    "sSubSup": _conv_ssubsup,
    "nary": _conv_nary,
    "rad": _conv_rad,
    "acc": _conv_acc,
    "bar": _conv_bar,
    "groupChr": _conv_groupchr,
    "lim": _conv_lim,
    "limLow": _conv_limlow,
    "limUpp": _conv_limupp,
    "eqArr": _conv_eqarr,
    "m": _conv_m,
    "mr": _conv_mr,
}

_DIRECT = frozenset(("box", "num", "den", "deg", "e", "sub", "sup",
                     "oMath", "oMathPara"))


# standalone sub/sup (n-ary limits) wrap as script groups; inside
# sSub/sSup the wrapper is unwrapped again by _unwrap
_DISPATCH["sub"] = lambda el: "_{%s}" % _children(el)
_DISPATCH["sup"] = lambda el: "^{%s}" % _children(el)


def _conv(el: ET.Element) -> str | None:
    t = _loc(el)
    fn = _DISPATCH.get(t)
    if fn is not None:
        return fn(el)
    if t in _DIRECT:
        return _children(el)
    return None


def omml_to_latex(omath: ET.Element) -> str:
    """Convert one ``m:oMath`` element to a LaTeX string."""
    return _children(omath).replace("  ", " ")


def paragraph_equations(p: ET.Element) -> list[tuple[str, object]]:
    """Split a WordprocessingML paragraph into ordered fragments:
    ``("eq", latex)`` for each ``m:oMath`` and ``("text", s)`` for each
    plain text chunk, preserving document order.

    Mirrors the reference's two-phase scan (msword_backend.py:1882-1936):
    direct-child oMath elements take priority; when none exist at the
    direct level, nested oMath (e.g. inside ``m:oMathPara``) are found by
    deep iteration.  Returns [] when the paragraph holds no equations.
    """
    W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
    frags: list[tuple[str, object]] = []
    direct = [ch for ch in p
              if "oMath" in ch.tag and "oMathPara" not in ch.tag]
    if direct:
        for ch in p:
            if "oMath" in ch.tag and "oMathPara" not in ch.tag:
                latex = omml_to_latex(ch).strip()
                if latex:
                    frags.append(("eq", latex))
            else:
                for sub in ch.iter():
                    if sub.tag == W + "t" and "math" not in sub.tag:
                        if isinstance(sub.text, str):
                            frags.append(("text", sub.text))
    else:
        for sub in p.iter():
            if sub.tag == W + "t":
                if isinstance(sub.text, str):
                    frags.append(("text", sub.text))
            elif "oMath" in sub.tag and "oMathPara" not in sub.tag:
                latex = omml_to_latex(sub).strip()
                if latex:
                    frags.append(("eq", latex))
    if not any(k == "eq" for k, _v in frags):
        return []
    return frags
