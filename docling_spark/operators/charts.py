"""Chart-to-table post-processing — the deterministic half of the
reference's chart-extraction stage
(models/stages/chart_extraction/granite_vision.py).

The Granite-Vision VLM reads a chart picture and answers with a CSV-ish
grid; everything AFTER that answer is rule-based
(_dataframe_to_tabledata, granite_vision.py:124-193):

- first row is a header iff ALL its values are non-numeric (:134-137)
- non-numeric DATA cells are row headers (:168-170)
- the grid explodes into unit-span TableCells with row offsets shifted
  by the inferred header (:139-186)

Here the VLM is the stubbed boundary (the grid arrives as CSV text in a
column, exactly how dotsx/deepseekx treat VLM layout output) and the
post-processing is pure JVM: two posexplodes, a per-chart
``forall`` header vote, and column expressions for the cell flags — no
Python anywhere, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# pandas.read_csv default NA tokens (the grid arrives via
# pd.read_csv(header=None), granite_vision.py CSV parse): these cells
# become NaN -> non-numeric for the header vote AND empty text
# (str-of-NaN branch, :163-166). Matched exactly, as read_csv does.
_NA_TOKENS = ("", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN",
              "-NaN", "-nan", "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA",
              "NULL", "NaN", "None", "n/a", "nan", "null", "none")


def _is_na(c: Column) -> Column:
    return c.isin(*_NA_TOKENS)


def _non_numeric(c: Column) -> Column:
    """granite_vision.py:114-122 (_is_numeric, negated): NA cells
    (pd.isna after read_csv's NA conversion) and anything float()
    rejects are non-numeric. try_cast('NaN') yields a numeric NaN, not
    NULL, so the NA-token gate must come first — float('NAN') also
    succeeds in the reference, keeping non-pandas spellings numeric on
    both sides."""
    return _is_na(c) | (F.trim(c) == "") | c.try_cast("double").isNull()


def chart_table_cells(
    charts: DataFrame,
    grid_col: str = "grid",
    id_cols: tuple[str, ...] = ("chart_id",),
) -> DataFrame:
    """(id…, grid: CSV text) → one row per table cell:
    (id…, row_idx, col_idx, text, column_header, row_header), mirroring
    TableData construction at granite_vision.py:124-193. Rows split on
    newlines, cells on commas (the VLM contract's grid shape).

    Output row count = num_rows x num_cols of the final table: when the
    first row is promoted to header it keeps row_idx 0 and data rows
    start at 1, exactly the reference's offset arithmetic.
    """
    ids = [F.col(c) for c in id_cols]
    # blank lines are skipped BEFORE indexing (read_csv's
    # skip_blank_lines): the JVM array filter compacts row indices with
    # no shuffle
    non_blank = F.filter(
        F.split(F.col(grid_col), "\r?\n"), lambda x: F.trim(x) != "")
    rows = charts.select(
        *ids,
        F.posexplode(non_blank).alias("row_idx", "line"),
    ).select(*ids, "row_idx", F.split("line", ",").alias("cells"))

    # header vote: ALL first-row cells non-numeric (granite_vision.py:134-137)
    hdr = rows.filter(F.col("row_idx") == 0).select(
        *ids,
        F.forall("cells", _non_numeric).alias("first_row_is_header"),
    )

    # chart-keyed equi-join (one hdr row per chart — corpus-sized, so a
    # keyed shuffle join, not a broadcast)
    cells = rows.join(hdr, list(id_cols)) \
        .select(
            *ids, "row_idx", "first_row_is_header",
            F.posexplode("cells").alias("col_idx", "text"),
        )
    is_header_row = F.col("first_row_is_header") & (F.col("row_idx") == 0)
    return cells.select(
        *ids,
        F.col("row_idx").cast("int").alias("row_idx"),
        F.col("col_idx").cast("int").alias("col_idx"),
        # NA cells render empty (str-of-NaN branch, :163-166). Known
        # deviation: a column that is ENTIRELY numeric gets pandas'
        # float repr in the reference ('10.50' -> '10.5'); cell text
        # here stays verbatim.
        F.when(_is_na(F.col("text")), "").otherwise(F.col("text"))
         .alias("text"),
        is_header_row.alias("column_header"),
        # non-numeric DATA cells are row headers (:168-170); header-row
        # cells are column headers, never row headers
        (~is_header_row & _non_numeric(F.col("text"))).alias("row_header"),
    )
