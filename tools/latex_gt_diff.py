"""Iteration driver for the latex walker: extract every reference latex
source (single files and multi-file arXiv trees) with texwalk and diff
the serialized markdown against the groundtruth.

Usage: python tools/latex_gt_diff.py [name ...] [-n CONTEXT] [-m MAXLINES]
"""

from __future__ import annotations

import difflib
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from docling_spark.engine.htmlx import serialize_items  # noqa: E402
from docling_spark.engine.texwalk import walk_latex  # noqa: E402

SRC = pathlib.Path("/root/reference/tests/data/latex/sources")
GT = pathlib.Path("/root/reference/tests/data/latex/groundtruth")


def load(name: str) -> tuple[str, dict[str, str]]:
    p = SRC / name
    if p.is_file():
        return p.read_text(errors="replace"), {}
    files: dict[str, str] = {}
    for f in p.rglob("*"):
        if f.is_file() and f.suffix in (".tex", ".sty", ".bbl", ".cls"):
            rel = str(f.relative_to(p))
            text = f.read_text(errors="replace")
            files.setdefault(rel, text)
            files.setdefault(f.name, text)
    main = next(
        (t for n, t in files.items() if n.endswith(".tex")
         and "\\begin{document}" in t and "\\documentclass" in t), None)
    if main is None:
        main = next(iter(files.values()))
    return main, files


def main() -> None:
    maxlines = 60
    context = 1
    argv = sys.argv[1:]
    args: list[str] = []
    i = 0
    while i < len(argv):  # flag VALUES must not leak into the name list
        if argv[i] == "-m":
            maxlines = int(argv[i + 1])
            i += 2
        elif argv[i] == "-n":
            context = int(argv[i + 1])
            i += 2
        elif argv[i].startswith("-"):
            i += 1
        else:
            args.append(argv[i])
            i += 1
    names = args or [
        "example_01.tex", "example_02.tex",
        "1706.03762", "2305.03393", "2310.06825", "2412.19437",
        "2501.00089", "arXiv-2501.01300v2",
    ]
    for name in names:
        gt_name = (name if name.endswith(".tex") else name + "_main.tex")
        gt_file = GT / (gt_name + ".md")
        if not gt_file.exists():
            print(f"{name}: no groundtruth")
            continue
        src, files = load(name)
        try:
            items = walk_latex(src, files)
            text = serialize_items(items, layer="body")
        except Exception as e:
            import traceback
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            traceback.print_exc(limit=6)
            continue
        g = gt_file.read_text()
        if text.strip() == g.strip():
            print(f"{name}: MATCH")
            continue
        ratio = difflib.SequenceMatcher(None, g, text).ratio()
        d = list(difflib.unified_diff(
            g.strip().splitlines(), text.strip().splitlines(),
            "groundtruth", "ours", lineterm="", n=context))
        print(f"{name}: DIFF ratio={ratio:.4f} difflines={len(d)}")
        for line in d[:maxlines]:
            print("  " + repr(line)[1:-1][:240])


if __name__ == "__main__":
    main()
