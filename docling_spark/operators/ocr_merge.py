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
    lines = F.split(F.col(tsv_col), "\n")
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
        # NULL) — gate explicitly so a missing header column yields null
        return F.when(p.isNotNull(), F.element_at(arr, p))

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


def ocr_score(cells: DataFrame,
              page_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Per-page mean confidence of the OCR-sourced merged cells
    (base_ocr_model.py:264-268 → conv_res.confidence ocr_score)."""
    return (
        cells.filter(F.col("from_ocr"))
        .groupBy(*page_cols)
        .agg(F.round(F.avg("conf"), 6).alias("ocr_score"))
    )
