"""Relational operators the engine needs beyond plain DataFrame calls —
currently the as-of (most-recent-prior) join, expressed in its
scale-correct distributed form.

A naive as-of join is `left JOIN right ON key AND right.ts <= left.ts`
+ a per-left-row max — a range join that Spark plans as a nested loop
(or an exploding theta-join) and that dies at 100 TB. The classic
distributed re-expression used here: UNION the two sides tagged by
origin, shuffle ONCE on the key, and carry the latest right-side row
forward with a `last(..., ignorenulls)` running window. Cost is one
exchange + one sort per key partition — the same price as the
sessionize window, with no join at all.

Reference anchor: the reference's caption/footnote proximity
attachment (docling layout postprocessing) is the same
"nearest-preceding item" shape; see docling_spark/operators/spatial.py
for the 2-D variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    seq: str | None = None,
    right_cols: tuple[str, ...] = (),
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right.ts <= left.ts`` for the same ``on`` key (backward as-of,
    ties included — DuckDB ``ASOF JOIN``'s ``>=`` semantics). Left rows
    with no prior right row keep nulls (left-outer semantics).

    ``seq`` breaks exact-``ts`` ties among right rows deterministically
    (the greatest ``seq`` wins); required for an engine-reproducible
    result when the timestamp column can collide.

    Plan shape: one hashpartitioning exchange on ``on`` + one
    partition-local sort; no join operator anywhere. Right-side values
    travel as a single struct so the running window carries one column
    regardless of ``right_cols`` width.
    """
    tie = [seq] if seq else []
    # a NULL-ts right row can never satisfy right.ts <= left.ts, but
    # Spark's nulls-first ascending sort would place it at the partition
    # head where last(ignorenulls) hands its values to every early left
    # row — exclude it up front
    right = right.filter(F.col(ts).isNotNull())
    # NULL join keys must never match each other: the window partitions
    # NULL keys together (unlike the documented `JOIN ... ON key`
    # equivalent, where NULL = NULL is never true) — drop null-key right
    # rows; null-key left rows stay and come back unmatched, exactly as
    # a left join leaves them
    right = right.filter(F.col(on).isNotNull())
    rstruct = F.struct(
        F.col(ts).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        F.col(on),
        F.col(ts).alias("__t"),
        *[F.col(c).alias(f"__tie_{i}") for i, c in enumerate(tie)],
        F.lit(0).alias("__side"),
        rstruct.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l = left.select(
        F.col(on),
        F.col(ts).alias("__t"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tie_{i}")
          for i, c in enumerate(tie)],
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # right rows sort BEFORE left rows at equal ts (side 0 < 1) so an
    # exact-ts right row is visible to the left row — the `<=` contract.
    order = ["__t", "__side"] + [f"__tie_{i}" for i in range(len(tie))]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    out = matched.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__m").getField("__ts").alias(f"{ts}{suffix}"),
        *[F.col("__m").getField(c).alias(f"{c}{suffix}")
          for c in right_cols],
    )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """Point-in-interval (range) join: every ``points`` row pairs with every
    ``intervals`` row of the same ``on`` key whose closed interval
    ``[start, end]`` contains the point's ``ts``.

    The naive spelling — ``JOIN ON key AND ts BETWEEN start AND end`` —
    makes Spark fall back to a broadcast-nested-loop/theta join (the range
    predicate can't hash). The distributed re-expression: quantize time
    into ``bucket_s``-second buckets, EXPLODE each interval over the
    buckets it covers, map each point to its single bucket, equi-join on
    ``(key, bucket)``, then refine with the exact range predicate. One
    hash shuffle per side; replication factor = interval_length /
    bucket_s + 1, so pick ``bucket_s`` near the typical interval length
    (e.g. 1 h windows → 3600). A point meets an interval in exactly one
    bucket (its own), so no post-join dedup is needed.

    Both ``ts``/``start``/``end`` are timestamp columns; interval bounds
    are inclusive (SQL BETWEEN semantics).
    """
    b = F.lit(int(bucket_s))
    b0 = F.floor(F.unix_timestamp(F.col(start)) / b)
    b1 = F.floor(F.unix_timestamp(F.col(end)) / b)
    iv = (
        intervals
        # reversed intervals (end < start — corrupt rows) can match
        # nothing, but Spark's sequence() would silently DESCEND over
        # them; drop them before the explode
        .filter(F.col(end) >= F.col(start))
        .withColumn(
            "__bucket",
            F.explode(
                # fail fast with a nameable cause instead of an executor
                # OOM: a sentinel open-ended interval (end=9999-12-31)
                # would materialize millions of bucket elements per row.
                # 1e6 buckets ≈ a century of 1h buckets — beyond any
                # real interval; raise names the knob to turn.
                F.when(
                    b1 - b0 > 1_000_000,
                    F.raise_error(F.concat(
                        F.lit("interval_join: interval spans more than "
                              "1000000 buckets — open-ended sentinel "
                              "end values must be clamped by the "
                              "caller, or raise bucket_s ("),
                        F.col(start).cast("string"), F.lit(" .. "),
                        F.col(end).cast("string"), F.lit(")"),
                    )).cast("array<bigint>"),
                ).otherwise(F.sequence(b0, b1))
            ),
        )
    )
    pt = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(ts)) / b)
    )
    # qualified refine columns: an intervals frame that also carries a
    # column named like `ts` (derived from the same event table) must
    # not make the predicate ambiguous
    joined = pt.alias("__pt").join(iv.alias("__iv"), [on, "__bucket"]).where(
        (F.col(f"__pt.{ts}") >= F.col(f"__iv.{start}"))
        & (F.col(f"__pt.{ts}") <= F.col(f"__iv.{end}"))
    )
    return joined.drop("__bucket")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on_big: str,
    on_small: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the big side's hot keys are spread over
    ``n_salts`` partitions by appending a deterministic per-row salt to the
    join key; the small side is replicated once per salt value (explode),
    so every (key, salt) pair still meets its match. Join cardinality and
    values are identical to ``big.join(small, key)`` — only the shuffle
    distribution changes: a key holding 50% of the rows now occupies
    ``n_salts`` reducers instead of one straggler.

    The salt is ``xxhash64(all big columns) % n_salts`` — deterministic
    (reproducible across runs and cluster sizes, unlike ``rand()``) and
    row-uniform. Small-side replication costs ``n_salts ×`` its size, so
    this is for small-but-unbroadcastable dimensions or when AQE's
    skew-join split can't fire (e.g. under a required output ordering).
    """
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        # right/full outer would emit every UNMATCHED small-side row once
        # per salt replica (n_salts duplicates) — the identical-result
        # contract only holds for joins that never null-extend the
        # replicated side
        raise ValueError(
            f"salted_join supports inner/left-flavored joins only, "
            f"got {how!r}: an unmatched small-side row would surface "
            f"{n_salts}x under right/full outer")
    if n_salts < 1:
        # pmod(h, 0) is NULL under non-ANSI Spark: every salt would be
        # NULL and the join silently returns zero rows / null-extends —
        # a dynamically computed salt count that rounds to 0 must raise
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    # the salt hashes every HASHABLE big column: xxhash64 rejects
    # MapType outright. Content-identical rows of a hot key still share
    # one salt — determinism (the reason we don't use rand()) makes that
    # unavoidable; pre-dedup duplicate-heavy corpora before salting.
    from pyspark.sql.types import MapType

    hashable = [c for c in big.columns
                if not isinstance(big.schema[c].dataType, MapType)]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in hashable]), F.lit(n_salts)
    ).cast("int")
    b = big.withColumn("__salt_l", salt)
    s = small.withColumn(
        "__salt_r",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    cond = (b[on_big] == s[on_small]) & (
        b["__salt_l"] == s["__salt_r"]
    )
    out = b.join(s, cond, how).drop("__salt_l", "__salt_r")
    if on_big == on_small and how not in ("left_semi", "leftsemi",
                                          "left_anti", "leftanti"):
        # mirror the name-based join's key dedup: the expression-
        # condition join keeps BOTH key columns, making any downstream
        # unqualified reference ambiguous
        out = out.drop(s[on_small])
    return out
