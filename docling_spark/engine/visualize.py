"""Layout-debug visualization sink — the stdlib-SVG analog of the
reference's ``draw_clusters`` (docling/utils/visualization.py:11), which
rasterizes cluster boxes + labels onto the page image with PIL. No
imaging stack exists in this sandbox (and none is needed server-side),
so the same debug information renders as one SVG document per page:

- a rectangle per layout cell in its label's color, translucent fill +
  solid outline (draw_clusters uses alpha 70/255 fill and opaque
  outline per label color — mirrored as fill-opacity 0.27);
- the label name and the cell's READING-ORDER index in a 12 px text
  anchored at the box's top-left (draw_clusters draws the label name
  with a 12 pt font; the order index is our addition — the rule-based
  reading order is exactly what this sink exists to debug);
- page-sized viewBox so the SVG overlays 1:1 on any rendering of the
  page (top-left-origin coordinates, the cell convention).

The palette is this repo's own deterministic label→color map (the
reference takes ``DocItemLabel.get_color`` from docling-core, which is
not part of the reference checkout; only the mapping's existence and
per-label stability matter for debugging).

SVG is plain text, so the sink composes with Spark as an ordinary
string column: see ``debug_svg_pages`` for the DataFrame operator.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

# deterministic per-label palette (hex) — stable across runs/engines
LABEL_COLORS = {
    "title": "#d62728",
    "section_header": "#ff7f0e",
    "text": "#1f77b4",
    "list_item": "#2ca02c",
    "table": "#9467bd",
    "picture": "#8c564b",
    "caption": "#e377c2",
    "formula": "#bcbd22",
    "code": "#17becf",
    "page_header": "#7f7f7f",
    "page_footer": "#7f7f7f",
    "footnote": "#aec7e8",
    "key_value_region": "#98df8a",
}
_DEFAULT_COLOR = "#333333"


def page_svg(cells: list[dict], page_size: tuple,
             page_no: int) -> str:
    """One page's cells (top-left-origin bboxes) → a standalone SVG
    string. Cells draw in the order given — pass reading-ordered cells
    and the painted indices ARE the reading order."""
    pw, ph = page_size
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'viewBox="0 0 {pw:g} {ph:g}" width="{pw:g}" height="{ph:g}">',
        f'<!-- page {page_no}: {len(cells)} cells -->',
        f'<rect x="0" y="0" width="{pw:g}" height="{ph:g}" '
        f'fill="#ffffff"/>',
    ]
    for k, c in enumerate(cells):
        x0, y0, x1, y1 = c["bbox"]
        if x1 < x0:
            x0, x1 = x1, x0
        if y1 < y0:
            y0, y1 = y1, y0
        color = LABEL_COLORS.get(c["label"], _DEFAULT_COLOR)
        parts.append(
            f'<rect x="{x0:.2f}" y="{y0:.2f}" '
            f'width="{x1 - x0:.2f}" height="{y1 - y0:.2f}" '
            f'fill="{color}" fill-opacity="0.27" '
            f'stroke="{color}" stroke-width="1"/>')
        tag = escape(f'{k}:{c["label"]}')
        parts.append(
            f'<text x="{x0:.2f}" y="{max(y0 - 2.0, 10.0):.2f}" '
            f'font-size="12" font-family="sans-serif" '
            f'fill="{color}">{tag}</text>')
    parts.append("</svg>")
    return "\n".join(parts)


def svg_pages(cells: list[dict],
              page_sizes: dict) -> dict:
    """Reading-ordered layout cells → {page_no: svg}. Pages with a size
    but no cells still get an (empty) SVG — totality mirrors the
    failed-page contract (every physical page present)."""
    by_page: dict[int, list[dict]] = {p: [] for p in page_sizes}
    for c in cells:
        by_page.setdefault(c["page_no"], []).append(c)
    return {
        p: page_svg(pc, page_sizes.get(p, (612.0, 792.0)), p)
        for p, pc in sorted(by_page.items())
    }


def pdf_debug_svg(payload: bytes, password: str = "") -> dict:
    """PDF bytes → {page_no: svg} with the FINAL layout labels and
    reading order (the same filter → display-typography → dedup →
    reading-order stages the extraction tail runs), so what the SVG
    shows is what the serializer consumed — the draw_clusters use-case
    (docling/utils/visualization.py:11 draws the post-processed
    clusters, not raw cells)."""
    from docling_spark.engine.layoutx import (
        dedup_cells,
        drop_full_page_pictures,
        filter_cells,
        mark_display_typography,
        reading_order,
    )
    from docling_spark.engine.pdfx import pdf_line_cells

    cells, page_sizes = pdf_line_cells(payload, password=password)
    cells = filter_cells(cells)
    cells = mark_display_typography(cells)
    cells = drop_full_page_pictures(cells, page_sizes)
    cells = dedup_cells(cells)
    ordered = reading_order(cells, page_sizes)
    return svg_pages(ordered, page_sizes)
