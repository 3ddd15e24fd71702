"""Chart→table post-processing (granite_vision.py:124-193 re-expression):
header inference, row-header typing, offset arithmetic."""

from __future__ import annotations

from docling_spark.operators.charts import chart_table_cells


def _cells(spark, grid):
    df = spark.createDataFrame([("c1", grid)], "chart_id string, grid string")
    return {(r["row_idx"], r["col_idx"]):
            (r["text"], r["column_header"], r["row_header"])
            for r in chart_table_cells(df).collect()}


def test_header_inferred_when_first_row_all_non_numeric(spark):
    got = _cells(spark, "year,sales\n2020,10.5\n2021,12")
    assert got[(0, 0)] == ("year", True, False)
    assert got[(0, 1)] == ("sales", True, False)
    # '2020' parses as numeric -> data cell, not a row header
    assert got[(1, 0)] == ("2020", False, False)
    assert got[(1, 1)] == ("10.5", False, False)
    assert len(got) == 6


def test_no_header_when_first_row_has_a_number(spark):
    got = _cells(spark, "2020,10\n2021,12")
    assert got[(0, 0)] == ("2020", False, False)
    assert all(not v[1] for v in got.values())  # no column headers at all


def test_non_numeric_data_cells_are_row_headers(spark):
    got = _cells(spark, "label,value\nalpha,1\nbeta,2")
    assert got[(1, 0)] == ("alpha", False, True)
    assert got[(2, 0)] == ("beta", False, True)
    assert got[(1, 1)] == ("1", False, False)


def test_empty_cell_is_non_numeric(spark):
    got = _cells(spark, "a,b\n,3")
    assert got[(1, 0)] == ("", False, True)


def test_plan_has_no_scale_killers(spark):
    df = spark.createDataFrame([("c1", "a,b\n1,2")],
                               "chart_id string, grid string")
    plan = chart_table_cells(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nan_cells_are_na_like_pandas(spark):
    # pd.read_csv turns 'NaN'/'n/a' into NaN -> non-numeric for the
    # header vote, row-header flag set, and EMPTY cell text
    got = _cells(spark, "NaN,label\n1,2")
    assert got[(0, 0)] == ("", True, False)   # header inferred, text ''
    got2 = _cells(spark, "a,b\nn/a,3")
    assert got2[(1, 0)] == ("", False, True)


def test_crlf_grid_tolerated(spark):
    got = _cells(spark, "year,sales\r\n2020,10.5\r\n")
    assert got[(1, 1)] == ("10.5", False, False)
    assert len(got) == 4
