

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
