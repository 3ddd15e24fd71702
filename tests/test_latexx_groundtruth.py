
import pytest


def test_subset_extensions() -> None:
    """Round-3 robustness additions: nested formatting, verb, footnote,
    href, math environments, verbatim, figure, description lists,
    chapter/paragraph sectioning, display \\[..\\] and inline \\(..\\)."""
    from docling_spark.engine.latexx import extract_latex

    doc = r"""
\title{T \textbf{B}}
\begin{document}
\maketitle
\chapter{Intro}
Nested \textbf{bold \textit{em}} then \verb|code_x| and
fn\footnote{note} and \href{http://x.y}{link} and \(a+b\).
\begin{align}
x &= y
\end{align}
\begin{verbatim}
def f():
    return 1
\end{verbatim}
\begin{figure}
\caption{Fig cap}
\end{figure}
\begin{description}
\item[term] meaning
\end{description}
\[E = mc^2\]
\end{document}
"""
    text, items, metrics = extract_latex(doc)
    assert text.startswith("# T B")
    assert "## Intro" in text
    assert "bold em" in text and "code_x" in text
    assert "fn (note)" in text
    assert "[link](http://x.y)" in text
    assert "$a+b$" in text
    assert "$$x &= y$$" in text
    assert "```\ndef f():\n    return 1\n```" in text
    assert "<!-- image -->" in text and "Fig cap" in text
    assert "- term meaning" in text
    assert "$$E = mc^2$$" in text


def test_archive_input_resolution() -> None:
    """Zip tex tree: \\input inlined from members, circular includes
    guarded, main file located by documentclass+begin{document}."""
    import io
    import zipfile

    from docling_spark.engine.latexx import (
        LatexError,
        extract_latex_archive,
    )

    main = (
        "\\documentclass{article}\\title{Arc}\\begin{document}"
        "\\maketitle\\section{One}\\input{body}\\end{document}"
    )
    body = "Body text from an included file.\\input{loop}"
    loop = "\\input{body}"  # circular
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("main.tex", main)
        z.writestr("body.tex", body)
        z.writestr("loop.tex", loop)
    text, items, m = extract_latex_archive(buf.getvalue())
    assert text.startswith("# Arc")
    assert "## One" in text
    assert "Body text from an included file." in text

    with pytest.raises(LatexError):
        extract_latex_archive(b"not a zip")


def test_archive_attention_paper_structure() -> None:
    """The real 1706.03762 source tree (reference corpus) flattens to a
    structured doc: correct title, all \\input sections present."""
    import io
    import pathlib
    import zipfile

    from docling_spark.engine.latexx import extract_latex_archive

    src = pathlib.Path(
        "/root/reference/tests/data/latex/sources/1706.03762")
    if not src.exists():
        pytest.skip("reference checkout not available")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for p in src.rglob("*"):
            if p.is_file() and p.suffix in (".tex", ".sty", ".bbl"):
                z.writestr(p.name, p.read_text(errors="replace"))
    text, items, m = extract_latex_archive(buf.getvalue())
    assert "# Attention Is All You Need" in text
    heads = [it["text"] for it in items
             if it["label"] == "section_header"]
    for expected in ("Introduction", "Background", "Model Architecture",
                     "Why Self-Attention", "Training", "Results",
                     "Conclusion"):
        assert any(expected in h for h in heads), expected
