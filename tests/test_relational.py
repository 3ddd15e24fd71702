"""as-of join: value correctness on a hand-built frame plus the plan
contract the module docstring promises — ONE exchange on the key and no
join operator anywhere (the union+running-window re-expression)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from docling_spark.operators.relational import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts("2026-01-01 10:00:00"), "c1"),
            ("u1", _ts("2026-01-01 10:05:00"), "c2"),
            ("u1", _ts("2026-01-01 09:00:00"), "c0"),  # before any view
            ("u2", _ts("2026-01-01 12:00:00"), "c3"),
            ("u3", _ts("2026-01-01 12:00:00"), "c4"),  # key with no views
        ],
        "user_id string, ts timestamp, click_id string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2026-01-01 09:30:00"), 1, 10.0),
            ("u1", _ts("2026-01-01 10:00:00"), 2, 20.0),  # exact-ts tie
            ("u1", _ts("2026-01-01 10:00:00"), 3, 30.0),  # greatest seq wins
            ("u2", _ts("2026-01-01 11:00:00"), 4, 40.0),
        ],
        "user_id string, ts timestamp, event_id int, view_value double",
    )
    return left, right


def test_asof_join_values(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", ts="ts", seq="event_id",
        right_cols=("view_value",), suffix="_view",
    )
    rows = {r["click_id"]: r for r in out.collect()}
    assert len(rows) == 5  # left-outer: every click survives
    # c0 precedes every view -> nulls
    assert rows["c0"]["ts_view"] is None
    assert rows["c0"]["view_value_view"] is None
    # c1 at 10:00 sees the exact-ts views; greatest event_id (3) wins
    assert rows["c1"]["view_value_view"] == 30.0
    assert rows["c1"]["ts_view"] == _ts("2026-01-01 10:00:00")
    # c2 at 10:05 still carries the latest prior view
    assert rows["c2"]["view_value_view"] == 30.0
    # u2's click sees u2's view, never u1's
    assert rows["c3"]["view_value_view"] == 40.0
    # u3 has no right rows at all -> nulls, row kept
    assert rows["c4"]["view_value_view"] is None


def test_asof_join_plan_one_exchange_no_join(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", ts="ts", seq="event_id",
        right_cols=("view_value",),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no join operator of any kind
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_left_columns_untouched(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user_id", ts="ts", seq="event_id",
                    right_cols=("view_value",))
    for c in left.columns:
        assert c in out.columns
    assert out.count() == left.count()
    # left schema types preserved
    lt = dict((f.name, f.dataType) for f in left.schema.fields)
    ot = dict((f.name, f.dataType) for f in out.schema.fields)
    for c in left.columns:
        assert ot[c] == lt[c]


def _iv_frames(spark):
    points = spark.createDataFrame(
        [
            ("u1", _ts("2026-01-01 10:30:00"), "p1"),  # inside w1
            ("u1", _ts("2026-01-01 11:00:00"), "p2"),  # == w1 end (inclusive)
            ("u1", _ts("2026-01-01 10:00:00"), "p3"),  # == w1 start
            ("u1", _ts("2026-01-01 12:30:00"), "p4"),  # outside all
            ("u2", _ts("2026-01-01 10:30:00"), "p5"),  # other key
        ],
        "user_id string, ts timestamp, pid string",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", "w1", _ts("2026-01-01 10:00:00"), _ts("2026-01-01 11:00:00")),
            # crosses a bucket boundary with bucket_s=3600
            ("u1", "w2", _ts("2026-01-01 10:45:00"), _ts("2026-01-01 11:15:00")),
            ("u2", "w3", _ts("2026-01-01 10:00:00"), _ts("2026-01-01 11:00:00")),
        ],
        "user_id string, wid string, start_ts timestamp, end_ts timestamp",
    )
    return points, intervals


def test_interval_join_values(spark):
    from docling_spark.operators.relational import interval_join

    points, intervals = _iv_frames(spark)
    out = interval_join(points, intervals, on="user_id", ts="ts",
                        bucket_s=3600)
    pairs = {(r["pid"], r["wid"]) for r in out.collect()}
    assert pairs == {
        ("p1", "w1"),            # plain containment
        ("p2", "w1"), ("p2", "w2"),  # inclusive end; cross-bucket interval
        ("p3", "w1"),            # inclusive start
        ("p5", "w3"),            # key isolation
    }
    # no duplicate pairs despite the interval explode
    assert out.count() == len(pairs)


def test_interval_join_plan_no_theta(spark):
    from docling_spark.operators.relational import interval_join

    points, intervals = _iv_frames(spark)
    out = interval_join(points, intervals, on="user_id", ts="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_salted_join_matches_plain_join(spark):
    from docling_spark.operators.relational import salted_join

    big = spark.range(0, 2000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("rid"))
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (9, "never")], "k2 int, name string")
    out = salted_join(big, small, on_big="k", on_small="k2", n_salts=8)
    plain = big.join(small, big["k"] == small["k2"])
    assert out.count() == plain.count() == 2000
    got = {(r["rid"], r["name"]) for r in out.collect()}
    want = {(r["rid"], r["name"]) for r in plain.collect()}
    assert got == want
    # composite join key includes the salt
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_salted_join_left_outer(spark):
    from docling_spark.operators.relational import salted_join

    big = spark.createDataFrame([(1, "x"), (5, "y")], "k int, v string")
    small = spark.createDataFrame([(1, "m")], "k2 int, name string")
    out = salted_join(big, small, on_big="k", on_small="k2",
                      n_salts=4, how="left")
    rows = {r["v"]: r["name"] for r in out.collect()}
    assert rows == {"x": "m", "y": None}


class TestRelationalReviewFixes:
    def test_asof_null_keys_never_match(self, spark):
        from docling_spark.operators.relational import asof_join

        left = spark.createDataFrame(
            [(None, "2026-01-01 10:00:00"), ("k", "2026-01-01 10:00:00")],
            "k string, ts string").selectExpr("k", "cast(ts as timestamp) ts")
        right = spark.createDataFrame(
            [(None, "2026-01-01 09:00:00", 1.0),
             ("k", "2026-01-01 09:00:00", 2.0)],
            "k string, ts string, v double"
        ).selectExpr("k", "cast(ts as timestamp) ts", "v")
        rows = {r["k"]: r for r in
                asof_join(left, right, on="k", right_cols=["v"]).collect()}
        assert rows["k"]["v_right"] == 2.0
        assert rows[None]["v_right"] is None  # NULL keys do not match

    def test_salted_join_rejects_zero_salts(self, spark):
        import pytest

        from docling_spark.operators.relational import salted_join

        big = spark.createDataFrame([(1, "a")], "k long, v string")
        small = spark.createDataFrame([(1, "x")], "k long, w string")
        with pytest.raises(ValueError, match="n_salts"):
            salted_join(big, small, "k", "k", n_salts=0)

    def test_salted_join_same_key_name_dedupes(self, spark):
        from docling_spark.operators.relational import salted_join

        big = spark.createDataFrame([(1, "a"), (2, "b")],
                                    "k long, v string")
        small = spark.createDataFrame([(1, "x")], "k long, w string")
        out = salted_join(big, small, "k", "k", n_salts=4)
        assert out.columns.count("k") == 1
        assert out.select("k").count() == 1  # unambiguous reference

    def test_salted_join_map_column_tolerated(self, spark):
        from docling_spark.operators.relational import salted_join

        big = spark.createDataFrame(
            [(1, {"m": "v"})], "k long, meta map<string,string>")
        small = spark.createDataFrame([(1, "x")], "k long, w string")
        assert salted_join(big, small, "k", "k", n_salts=4).count() == 1

    def test_interval_join_drops_reversed_and_qualifies_ts(self, spark):
        from docling_spark.operators.relational import interval_join

        points = spark.createDataFrame(
            [(1, "2026-01-01 10:30:00")], "k long, ts string"
        ).selectExpr("k", "cast(ts as timestamp) ts")
        # intervals carry their own 'ts' column (same name as points) +
        # one reversed interval
        intervals = spark.createDataFrame(
            [(1, "2026-01-01 10:00:00", "2026-01-01 11:00:00",
              "2026-01-01 00:00:00"),
             (1, "2026-01-01 12:00:00", "2026-01-01 09:00:00",
              "2026-01-01 00:00:00")],
            "k long, start_ts string, end_ts string, ts string",
        ).selectExpr("k", "cast(start_ts as timestamp) start_ts",
                     "cast(end_ts as timestamp) end_ts",
                     "cast(ts as timestamp) ts")
        out = interval_join(points, intervals, on="k")
        assert out.count() == 1  # reversed interval ignored, no ambiguity
