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


def _non_numeric(c: Column) -> Column:
    """granite_vision.py:114-122 (_is_numeric, negated): empty/NaN cells
    and anything float() rejects are non-numeric."""
    return (F.trim(c) == "") | c.try_cast("double").isNull()


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
    rows = charts.select(
        *ids,
        F.posexplode(F.split(F.col(grid_col), "\n")).alias("row_idx", "line"),
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
        F.col("text"),
        is_header_row.alias("column_header"),
        # non-numeric DATA cells are row headers (:168-170); header-row
        # cells are column headers, never row headers
        (~is_header_row & _non_numeric(F.col("text"))).alias("row_header"),
    )
