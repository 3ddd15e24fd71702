"""Layout-debug SVG sink as a DataFrame operator — the cluster-drawing
debug surface (docling/utils/visualization.py:11 ``draw_clusters``)
lifted to table scale: one row per (doc, page) carrying a standalone
SVG of the final layout boxes/labels in reading order.

Spark shape: one Arrow-batched ``mapInPandas`` over the payload column
— the whole layout tail (parse → filter → dedup → reading order → SVG
text) runs executor-side per document, no driver round-trip, no
shuffle beyond the source's own partitioning. SVG rows are plain
strings, so any sink (parquet, files, HTTP response) carries them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def debug_svg_pages(docs: DataFrame, text_col: str = "text",
                    doc_col: str = "doc_id",
                    fmt: str = "pdfish") -> DataFrame:
    """(doc, payload) → (doc, page_no, n_cells, svg).

    ``fmt``: ``pdfish`` (JSON-lines layout cells, the reference's
    parsed-page shape) or ``pdf`` (raw/base64 PDF bytes). Unparseable
    payloads yield no rows — the debug sink never fails a job the
    extraction pipeline would have contained.
    """
    import base64

    import pandas as pd

    if fmt not in ("pdfish", "pdf"):
        raise ValueError(f"unknown debug format: {fmt}")
    doc_type = {f.name: f.dataType.simpleString()
                for f in docs.schema.fields}[doc_col]
    src = docs.select(doc_col, text_col)

    def run(batches):
        from docling_spark.engine.layoutx import (
            dedup_cells,
            drop_full_page_pictures,
            filter_cells,
            mark_display_typography,
            parse_payload,
            reading_order,
        )
        from docling_spark.engine.visualize import pdf_debug_svg, svg_pages

        for pdf in batches:
            out = {doc_col: [], "page_no": [], "n_cells": [], "svg": []}
            for doc, payload in zip(pdf[doc_col], pdf[text_col]):
                if payload is None:
                    continue
                try:
                    if fmt == "pdf":
                        raw = (payload.encode("latin-1")
                               if payload.startswith("%PDF")
                               else base64.b64decode(payload))
                        svgs = pdf_debug_svg(raw)
                        counts = {p: s.count("<rect") - 1
                                  for p, s in svgs.items()}
                    else:
                        cells, sizes = parse_payload(payload)
                        cells = filter_cells(cells)
                        cells = mark_display_typography(cells)
                        cells = drop_full_page_pictures(cells, sizes)
                        cells = dedup_cells(cells)
                        ordered = reading_order(cells, sizes)
                        svgs = svg_pages(ordered, sizes)
                        counts = {p: s.count("<rect") - 1
                                  for p, s in svgs.items()}
                except Exception:
                    continue  # contained, like the extraction kernel
                for p, svg in sorted(svgs.items()):
                    out[doc_col].append(doc)
                    out["page_no"].append(p)
                    out["n_cells"].append(counts[p])
                    out["svg"].append(svg)
            yield pd.DataFrame(out)

    return src.mapInPandas(
        run, f"{doc_col} {doc_type}, page_no int, n_cells int, svg string")
