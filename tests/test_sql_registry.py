"""SQL-surface registration: the engine's kernels callable from
spark.sql (§2.j registry surface)."""

from pyspark.sql import functions as F


def test_registered_udfs_match_operator(spark):
    from docling_spark.functions.register import register_sql_udfs
    from docling_spark.operators.extract_ops import extract_turns

    register_sql_udfs(spark)
    df = spark.createDataFrame(
        [
            ("c", 0, "u", None, "<h1>T</h1><p>body</p>", "html"),
            ("c", 1, "u", None, "WEBVTT\n\n00:00.000 --> 00:01.000\nhi", ""),
            ("c", 2, "u", None, "plain  spaced   text", ""),
        ],
        "conv_id string, turn_idx int, role string, ts timestamp, "
        "text string, tool string",
    )
    df.createOrReplaceTempView("turns")
    sql_rows = {
        r["turn_idx"]: (r["fmt"], r["ext"])
        for r in spark.sql(
            "select turn_idx, detect_payload_format(text, tool) fmt, "
            "extract_text(text, tool) ext from turns"
        ).collect()
    }
    op_rows = {
        r["turn_idx"]: (r["format"], r["extracted_text"])
        for r in extract_turns(df).collect()
    }
    assert sql_rows == op_rows

    norm = spark.sql(
        "select normalize_text('a  b c…') n"
    ).collect()[0]["n"]
    assert norm == "a b c..."


def test_grade_thresholds(spark):
    from docling_spark.operators.textstats import score_to_grade

    df = spark.createDataFrame(
        [(0.0,), (0.49,), (0.5,), (0.79,), (0.8,), (0.89,), (0.9,), (1.0,)],
        "s double",
    )
    got = [r["g"] for r in
           df.select(score_to_grade(F.col("s")).alias("g")).collect()]
    assert got == ["poor", "poor", "fair", "fair", "good", "good",
                   "excellent", "excellent"]
