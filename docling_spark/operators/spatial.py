"""Distributed spatial containment joins over layout geometry.

The reference resolves two geometric parent-child relations during
layout postprocessing, per page, in Python loops:

- wrapper→child containment (layout_postprocessor.py special-cluster
  pass): an element belongs to a wrapper cluster when the wrapper's
  bbox covers enough of it;
- picture→table-cell assignment (readingorder_model.py:162-251): a
  picture attaches to the cell whose bbox covers ≥ 0.8 of it, ties
  broken deterministically.

Here both are ONE relational shape: an equi-join on the document key
(hash shuffle, co-located per doc), a JVM coverage expression
(intersection area over child area), and a per-child best-candidate
window.  No cross-document pairs ever form; per-doc candidate counts
are bounded by elements-per-page, so the join is linear at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def containment_join(
    parents: DataFrame,
    children: DataFrame,
    min_coverage: float = 0.8,
    key: str = "doc_id",
) -> DataFrame:
    """Assign each child to the parent covering the largest share of it.

    Inputs carry ``(key, <id>, l, t, r, b)`` with ``parent_id`` /
    ``child_id`` id columns.  Output: one row per assigned child —
    ``(key, child_id, parent_id, coverage)`` — children whose best
    coverage falls below ``min_coverage`` produce no row (the
    reference leaves them unattached).
    """
    p = parents.select(
        F.col(key), F.col("parent_id"),
        F.col("l").alias("pl"), F.col("t").alias("pt"),
        F.col("r").alias("pr"), F.col("b").alias("pb"),
    )
    c = children.select(
        F.col(key), F.col("child_id"),
        F.col("l").alias("cl"), F.col("t").alias("ct"),
        F.col("r").alias("cr"), F.col("b").alias("cb"),
    )
    j = c.join(p, key)  # hash equi-join on the document key only
    iw = F.greatest(
        F.least(F.col("cr"), F.col("pr"))
        - F.greatest(F.col("cl"), F.col("pl")),
        F.lit(0.0),
    )
    ih = F.greatest(
        F.least(F.col("cb"), F.col("pb"))
        - F.greatest(F.col("ct"), F.col("pt")),
        F.lit(0.0),
    )
    area = (F.col("cr") - F.col("cl")) * (F.col("cb") - F.col("ct"))
    coverage = F.when(area > 0, (iw * ih) / area).otherwise(F.lit(0.0))
    j = j.withColumn("coverage", F.round(coverage, 6))
    w = Window.partitionBy(key, "child_id").orderBy(
        F.desc("coverage"), F.asc("parent_id"))
    return (
        j.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") == 1)
                & (F.col("coverage") >= min_coverage))
        .select(key, "child_id", "parent_id", "coverage")
    )
