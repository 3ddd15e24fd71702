"""Bucketing = the pre-paid shuffle: writing both join sides bucketed
(+sorted) on the key lets every later join/aggregate on that key run with
ZERO exchange — the 100 TB recipe for a fact table joined repeatedly on
the same key. Asserts the plan property, not just the values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark):
    big = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("w"))
    for name, df in (("bkt_big", big), ("bkt_dim", dim)):
        df.write.bucketBy(8, "k").sortBy("k").mode("overwrite") \
            .format("parquet").saveAsTable(name)
    yield spark.table("bkt_big"), spark.table("bkt_dim")
    for name in ("bkt_big", "bkt_dim"):
        spark.sql(f"drop table if exists {name}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    a, b = bucketed_tables
    # merge hint keeps the small side off the broadcast path so the test
    # exercises the co-located shuffle-free sort-merge join
    j = a.join(b.hint("merge"), "k")
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert j.count() == 1000

    # contrast: the same join over non-bucketed frames shuffles both sides
    a2 = spark.range(0, 10000).select(F.col("id").alias("k"))
    b2 = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan2 = _plan(a2.join(b2.hint("merge"), "k"))
    assert "Exchange" in plan2


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    a, _ = bucketed_tables
    agg = a.groupBy("k").agg(F.sum("v").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan
    assert agg.count() == 10000
