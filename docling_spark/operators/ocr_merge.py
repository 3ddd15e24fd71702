"""OCR cell extraction + OCR/PDF cell merge — the deterministic tail of
the reference's tesseract CLI OCR stage, re-expressed relationally.

1. :func:`tsv_ocr_cells` — tesseract's TSV stdout → text cells
   (models/stages/ocr/tesseract_ocr_cli_model.py:195-217 read_csv +
   non-empty-text filter; cell construction :360-389: bbox =
   (left, top, left+width, top+height), confidence = conf/100).
   Tesseract itself is the stubbed boundary (its TSV answer arrives as
   a column); the parse is pure JVM — line/tab posexplode with
   header-positional column resolution, exactly pandas.read_csv's
   behavior of trusting the header row, not fixed offsets.

2. :func:`merge_ocr_pdf_cells` — ``_merge_ocr_and_pdf_cells``
   (models/base_ocr_model.py:274-340): prioritized cells are all kept;
   secondary cells survive only if they overlap NO prioritized cell on
   the same page (the reference's R-tree bbox intersection — "a weak
   criterion but it works", :305). The reference builds a per-page
   R-tree; at table scale this is a page-keyed overlap LEFT ANTI join,
   which Spark executes as a shuffled equi-join on the page key with
   the interval predicate applied post-match — per-page cell counts are
   bounded (a few thousand), so no range-join machinery is needed and
   the shuffle keys are exactly the partition keys the extraction
   output already carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PDF_FIRST = "pdf_cells_first"   # base_ocr_model.py:33-34
OCR_FIRST = "ocr_cells_first"   # base_ocr_model.py:36-37


def tsv_ocr_cells(
    df: DataFrame,
    tsv_col: str = "tsv",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(id…, tsv text) → one row per OCR cell: (id…, cell_idx, text,
    conf, l, t, r, b). Column positions come from the TSV header row
    (read_csv semantics); rows whose text is missing or whitespace-only
    are dropped (tesseract_ocr_cli_model.py:212-216). ``cell_idx`` is
    the surviving rows' 0-based order (the reference re-indexes merged
    cells, base_ocr_model.py:272)."""
    ids = [F.col(c) for c in id_cols]
    lines = F.split(F.col(tsv_col), "\r?\n")  # CRLF-tolerant (Windows tesseract)
    header = F.split(F.element_at(lines, 1), "\t")

    def pos(name: str) -> Column:
        # a header missing the column yields position 0 -> nullif makes
        # element_at return null (containment) instead of raising the
        # INVALID_ARRAY_INDEX executor error
        # array_position yields bigint; element_at wants int
        return F.nullif(F.array_position(header, name), F.lit(0)).cast("int")

    def at(arr: Column, p: Column) -> Column:
        # F.element_at with a NULL Column index silently resolves to the
        # LAST element (observed on pyspark 4.1; SQL element_at returns
        # NULL) — gate explicitly so a missing header column yields
        # null. try_element_at, not element_at: a data line SHORTER than
        # the header (truncated tesseract output) must null the field,
        # not raise INVALID_ARRAY_INDEX under ANSI mode (row-level
        # containment).
        return F.when(p.isNotNull(), F.try_element_at(arr, p))

    rows = df.select(
        *ids,
        pos("left").alias("_pl"), pos("top").alias("_pt"),
        pos("width").alias("_pw"), pos("height").alias("_ph"),
        pos("conf").alias("_pc"), pos("text").alias("_px"),
        F.posexplode(F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0))))
         .alias("line_idx", "line"),
    ).filter(F.trim("line") != "").select(
        *ids, "line_idx", "_pl", "_pt", "_pw", "_ph", "_pc",
        F.split("line", "\t").alias("f"),
        at(F.split("line", "\t"), F.col("_px")).alias("text"),
    ).filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )

    def fld(p: str) -> Column:
        # try_cast: a malformed numeric field nulls out instead of an
        # ANSI executor error (row-level containment)
        return at(F.col("f"), F.col(p)).try_cast("double")

    left, top = fld("_pl"), fld("_pt")
    out = rows.select(
        *ids,
        F.col("line_idx"),
        F.col("text"),
        (fld("_pc") / 100.0).alias("conf"),
        left.alias("l"), top.alias("t"),
        (left + fld("_pw")).alias("r"),
        (top + fld("_ph")).alias("b"),
    )
    w = F.row_number().over(
        Window.partitionBy(*id_cols).orderBy("line_idx")) - 1
    return out.withColumn("cell_idx", w).drop("line_idx")


def _overlaps(a: str, b: str) -> Column:
    """Inclusive bbox intersection, matching rtree's closed-interval
    ``intersection`` (touching boxes DO intersect)."""
    return (
        (F.col(f"{a}.l") <= F.col(f"{b}.r"))
        & (F.col(f"{a}.r") >= F.col(f"{b}.l"))
        & (F.col(f"{a}.t") <= F.col(f"{b}.b"))
        & (F.col(f"{a}.b") >= F.col(f"{b}.t"))
    )


def merge_ocr_pdf_cells(
    ocr: DataFrame,
    pdf: DataFrame,
    priority: str = PDF_FIRST,
    page_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Union of prioritized cells and non-overlapping secondary cells
    (base_ocr_model.py:274-340). Both inputs need ``page_cols`` +
    (text, conf, l, t, r, b); output adds ``from_ocr``.

    Spark shape: one page-keyed LEFT ANTI join (secondary vs
    prioritized, overlap predicate) + union. No R-tree is needed: the
    equi-join on the page key bounds the candidate set to one page's
    cells, the same pruning the reference's per-page tree provides."""
    if priority not in (PDF_FIRST, OCR_FIRST):
        raise ValueError(f"unknown priority {priority!r}")
    ocr = ocr.withColumn("from_ocr", F.lit(True))
    pdf = pdf.withColumn("from_ocr", F.lit(False))
    cols = [*page_cols, "text", "conf", "l", "t", "r", "b", "from_ocr"]
    ocr, pdf = ocr.select(*cols), pdf.select(*cols)
    prio, sec = (pdf, ocr) if priority == PDF_FIRST else (ocr, pdf)

    p, s = prio.alias("p"), sec.alias("s")
    on = F.lit(True)
    for c in page_cols:
        on = on & (F.col(f"p.{c}") == F.col(f"s.{c}"))
    survivors = s.join(p, on & _overlaps("s", "p"), "left_anti")
    return prio.unionByName(survivors)


def ocr_regions(
    clusters: DataFrame,
    text_cells: DataFrame,
    bitmap_rects: DataFrame,
    page_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """PDF-aware OCR region selection
    (base_ocr_model.py:106-153, _find_pdf_aware_layout_ocr_rects): a
    layout cluster becomes an OCR input region iff it overlaps at least
    one non-text (bitmap) rect, OR it overlaps no programmatic text
    cell. Inputs need ``page_cols`` + (l, t, r, b); clusters may carry
    extra columns (cluster_id, label) that pass through.

    Spark shape: one page-keyed LEFT SEMI join (bitmap overlap) union
    one LEFT ANTI + LEFT ANTI chain (no bitmap, no text) — the two
    branches are disjoint by construction, so the union is exact, and
    every join is an equi-join on the page key with the closed-interval
    overlap predicate applied post-match (the reference's per-page
    R-tree pruning, relationally)."""
    c, bm, tx = clusters.alias("s"), bitmap_rects.alias("p"), \
        text_cells.alias("p2")

    def on(right: str) -> Column:
        cond = F.lit(True)
        for k in page_cols:
            cond = cond & (F.col(f"s.{k}") == F.col(f"{right}.{k}"))
        return cond

    with_bitmap = c.join(bm, on("p") & _overlaps("s", "p"), "left_semi")
    no_bitmap = c.join(bm, on("p") & _overlaps("s", "p"), "left_anti")
    no_pdf_at_all = no_bitmap.alias("s").join(
        tx, on("p2") & _overlaps("s", "p2"), "left_anti")
    return with_bitmap.unionByName(no_pdf_at_all)


def dedup_rects(
    rects: DataFrame,
    page_w: float,
    page_h: float,
    dilation_size: int = 20,
    page_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Rect-level re-expression of ``_deduplicate_rects``
    (base_ocr_model.py:155-210): rects are rounded, clipped to the page,
    grown by ``dilation_size/2`` on every side, and transitively merged
    into enclosing boxes; per page it also yields the covered-area
    fraction (union of the dilated rects / page area).

    Documented deviation from the reference: it rasterizes (PIL draw →
    dilate → connected components), so pixel-level effects — diagonal
    adjacency, even-kernel anchor asymmetry, inclusive endpoint fills —
    differ at ±1 px; this operator merges two rects when their clipped
    dilated boxes intersect (closed intervals) and computes the exact
    union area by scanline, which is the raster's limit at infinite
    resolution. Output: (page…, region_idx, l, t, r, b, coverage).

    Spark shape: per-page collect_list pack + ONE batched mapInPandas
    (thousands of pages per Arrow batch — the per-group applyInPandas
    overhead pattern measured in scenes.py), behind a pinned
    round-robin repartition so AQE cannot serialize the CPU-bearing
    byte-small rows onto one core."""
    import pandas as pd

    m = dilation_size / 2.0
    types = {fl.name: fl.dataType.simpleString()
             for fl in rects.schema.fields}
    key_schema = ", ".join(f"{k} {types[k]}" for k in page_cols)
    schema = (f"{key_schema}, region_idx int, l double, t double, "
              f"r double, b double, coverage double")

    packed = rects.groupBy(*page_cols).agg(
        F.collect_list(F.struct("l", "t", "r", "b")).alias("rs"))
    packed = packed.repartition(
        rects.sparkSession.sparkContext.defaultParallelism)

    def merge_page(rs: list) -> tuple[list, float]:
        boxes = []
        for rec in rs:
            x0 = max(0.0, min(round(rec["l"]) - m, page_w))
            y0 = max(0.0, min(round(rec["t"]) - m, page_h))
            x1 = max(0.0, min(round(rec["r"]) + m, page_w))
            y1 = max(0.0, min(round(rec["b"]) + m, page_h))
            if x1 > x0 and y1 > y0:
                boxes.append([x0, y0, x1, y1])
        n = len(boxes)
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(n):
            for j in range(i + 1, n):
                a, b = boxes[i], boxes[j]
                if a[0] <= b[2] and a[2] >= b[0] and \
                        a[1] <= b[3] and a[3] >= b[1]:
                    parent[find(i)] = find(j)
        comp: dict[int, list] = {}
        for i in range(n):
            root = find(i)
            e = comp.setdefault(root, [*boxes[i]])
            e[0] = min(e[0], boxes[i][0])
            e[1] = min(e[1], boxes[i][1])
            e[2] = max(e[2], boxes[i][2])
            e[3] = max(e[3], boxes[i][3])
        # exact union area by x-scanline over rect edges
        xs = sorted({b[0] for b in boxes} | {b[2] for b in boxes})
        area = 0.0
        for x_lo, x_hi in zip(xs, xs[1:]):
            ys = sorted((b[1], b[3]) for b in boxes
                        if b[0] <= x_lo and b[2] >= x_hi)
            cov_y = last = 0.0
            for y0, y1 in ys:
                lo = max(y0, last)
                if y1 > lo:
                    cov_y += y1 - lo
                    last = y1
            area += cov_y * (x_hi - x_lo)
        # reading order: top-to-bottom then left-to-right
        out = sorted(comp.values(), key=lambda e: (e[1], e[0]))
        return out, area / (page_w * page_h)

    def run(batches):
        for pdf in batches:
            cols: dict[str, list] = {k: [] for k in page_cols}
            cols.update(region_idx=[], l=[], t=[], r=[], b=[],
                        coverage=[])
            for _, row in pdf.iterrows():
                regions, cov = merge_page(row["rs"])
                for ri, (x0, y0, x1, y1) in enumerate(regions):
                    for k in page_cols:
                        cols[k].append(row[k])
                    cols["region_idx"].append(ri)
                    cols["l"].append(x0)
                    cols["t"].append(y0)
                    cols["r"].append(x1)
                    cols["b"].append(y1)
                    cols["coverage"].append(cov)
            yield pd.DataFrame(cols)

    return packed.mapInPandas(run, schema=schema)


def ocr_score(cells: DataFrame,
              page_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Per-page mean confidence of the OCR-sourced merged cells
    (base_ocr_model.py:264-268 → conv_res.confidence ocr_score)."""
    return (
        cells.filter(F.col("from_ocr"))
        .groupBy(*page_cols)
        .agg(F.round(F.avg("conf"), 6).alias("ocr_score"))
    )
