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


def _overlap_1d(lo1, hi1, lo2, hi2):
    """Positive 1-D overlap length of [lo1,hi1] and [lo2,hi2] — the ONE
    definition behind every coverage/gap expression in this module (three
    hand-copied greatest/least blocks used to drift independently)."""
    return F.greatest(F.least(hi1, hi2) - F.greatest(lo1, lo2), F.lit(0.0))


def _finite_boxes(df: DataFrame) -> DataFrame:
    """Drop rows with any NULL bbox edge: Spark's greatest/least SKIP
    nulls, so a malformed edge-less rect would act as an infinite edge
    and capture every candidate on its page with coverage 1.0."""
    return df.filter(
        F.col("l").isNotNull() & F.col("t").isNotNull()
        & F.col("r").isNotNull() & F.col("b").isNotNull())


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

    When BOTH inputs carry a ``page`` column it joins the join key and
    the per-child window: page-local coordinates on different pages of
    one document must never form containment pairs (two pages both have
    a box at (0,0,100,100)). Candidate counts are then bounded by
    elements-per-page; page-less inputs keep the per-doc bound.
    """
    has_p, has_c = "page" in parents.columns, "page" in children.columns
    if has_p != has_c:
        # a one-sided page column must not silently degrade to the
        # doc-level join: page-local coordinates on different pages
        # would form false containment pairs
        raise ValueError(
            "containment_join: 'page' present on only one input "
            f"(parents={has_p}, children={has_c}) — drop it or add it "
            "to both sides")
    paged = has_p and has_c
    keys = [key, "page"] if paged else [key]
    parents = _finite_boxes(parents)
    children = _finite_boxes(children)
    p = parents.select(
        *keys, F.col("parent_id"),
        F.col("l").alias("pl"), F.col("t").alias("pt"),
        F.col("r").alias("pr"), F.col("b").alias("pb"),
    )
    c = children.select(
        *keys, F.col("child_id"),
        F.col("l").alias("cl"), F.col("t").alias("ct"),
        F.col("r").alias("cr"), F.col("b").alias("cb"),
    )
    j = c.join(p, keys)  # hash equi-join on the doc (+page) key only
    iw = _overlap_1d(F.col("cl"), F.col("cr"), F.col("pl"), F.col("pr"))
    ih = _overlap_1d(F.col("ct"), F.col("cb"), F.col("pt"), F.col("pb"))
    area = (F.col("cr") - F.col("cl")) * (F.col("cb") - F.col("ct"))
    coverage = F.when(area > 0, (iw * ih) / area).otherwise(F.lit(0.0))
    # threshold BEFORE the window, on the UNROUNDED value: (a) rounding
    # first admitted coverages up to 5e-7 below the reference's raw
    # compare; (b) dropping sub-threshold candidates up front shrinks
    # the window's sort input by the non-overlapping majority — the
    # surviving max is the same row either way. coverage > 0 always: a
    # zero-coverage "best" must never attach (min_coverage=0 callers
    # mean "any overlapping parent", not "any parent").
    j = (
        j.withColumn("_cov", coverage)
        .filter((F.col("_cov") >= min_coverage) & (F.col("_cov") > 0))
        .withColumn("coverage", F.round("_cov", 6))
    )
    w = Window.partitionBy(*keys, "child_id").orderBy(
        F.desc("_cov"), F.asc("parent_id"))
    return (
        j.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(*keys, "child_id", "parent_id", "coverage")
    )


def hyperlink_attach(
    items: DataFrame,
    links: DataFrame,
    min_coverage: float = 0.5,
    key: str = "doc_id",
) -> DataFrame:
    """Hyperlink→element attachment, the reference's max-coverage rule
    (page_assemble_model.py:60-110) as one relational shape.

    Semantics re-expressed exactly: coverage of an element by a URI is
    the SUM over that URI's annotation rects of
    intersection_over_self(item_bbox, rect) — one link wrapping across
    lines contributes all its rects — and the element takes the URI with
    the highest summed coverage, only if it reaches ``min_coverage``
    (the reference's _HYPERLINK_COVERAGE_THRESHOLD = 0.5). Ties break on
    the lexicographically smaller URI (the reference's dict-order tie is
    nondeterministic; a deterministic tiebreak is strictly better).

    Inputs: ``items (key, page, item_id, l, t, r, b)``, ``links
    (key, page, uri, l, t, r, b)`` — both top-left origin (``t < b``),
    one links row per annotation rect. Output: one row per attached
    element — ``(key, page, item_id, uri, coverage)``.

    Scale shape (same as :func:`containment_join`): hash equi-join on
    ``(key, page)`` so only same-page geometry ever meets, JVM overlap
    arithmetic, a partial-agg groupBy on (item, uri), and a per-item
    window — per-page candidate counts are bounded by
    annotations-per-page, linear at 100 TB.
    """
    it = _finite_boxes(items).select(
        F.col(key), F.col("page"), F.col("item_id"),
        F.col("l").alias("il"), F.col("t").alias("it"),
        F.col("r").alias("ir"), F.col("b").alias("ib"),
    )
    # a NULL uri must neither form its own candidate group nor win ties
    # (asc ordering is nulls-FIRST) — there is nothing to attach
    lk = _finite_boxes(links.filter(F.col("uri").isNotNull())).select(
        F.col(key), F.col("page"), F.col("uri"),
        F.col("l").alias("ll"), F.col("t").alias("lt"),
        F.col("r").alias("lr"), F.col("b").alias("lb"),
    )
    j = it.join(lk, [key, "page"])
    iw = _overlap_1d(F.col("il"), F.col("ir"), F.col("ll"), F.col("lr"))
    ih = _overlap_1d(F.col("it"), F.col("ib"), F.col("lt"), F.col("lb"))
    area = (F.col("ir") - F.col("il")) * (F.col("ib") - F.col("it"))
    over_self = F.when(area > 0, (iw * ih) / area).otherwise(F.lit(0.0))
    per_uri = (
        j.withColumn("_c", over_self)
        .groupBy(key, "page", "item_id", "uri")
        .agg(F.sum("_c").alias("_cov"))
        # threshold before the window, unrounded — see containment_join
        .filter(F.col("_cov") >= min_coverage)
        .withColumn("coverage", F.round("_cov", 6))
    )
    w = Window.partitionBy(key, "page", "item_id").orderBy(
        F.desc("_cov"), F.asc("uri"))
    return (
        per_uri.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(key, "page", "item_id", "uri", "coverage")
    )


def attach_nearest(
    hosts: DataFrame,
    attachments: DataFrame,
    key: str = "doc_id",
    max_gap: float | None = None,
) -> DataFrame:
    """Caption/footnote → element attachment as a proximity join.

    The reference re-parents caption and footnote items under their host
    table/picture/code element via el→captions / el→footnotes mappings
    (readingorder_model.py:631-649, consumed at 382-398); the proximity
    predictor itself lives in the external ``docling_ibm_models`` package
    (not available in this environment), so the rule is re-expressed
    from its published behavior: an attachment binds to the nearest host
    on its page that overlaps it horizontally, where distance is the
    vertical gap between the boxes (0 when they overlap vertically),
    ties broken by the smaller ``host_id``.

    Same scale shape as :func:`containment_join`: a hash equi-join on
    ``(key, page)`` co-locates each page's elements, a JVM gap
    expression scores candidates, and a per-attachment window keeps the
    best. No cross-document or cross-page pairs ever form, and per-page
    candidate counts are bounded by elements-per-page, so the join stays
    linear at 100 TB.

    Inputs carry ``(key, page, host_id|attach_id, l, t, r, b)`` with a
    top-left origin (``t < b``). Output: one row per attached item —
    ``(key, page, attach_id, host_id, gap, pos)`` with ``pos`` one of
    ``below`` / ``above`` / ``overlap`` (attachment relative to host).
    Attachments with no horizontally-overlapping host on their page —
    or none within ``max_gap`` when set — produce no row (the reference
    leaves such items as ordinary body text).
    """
    if max_gap is not None and max_gap < 0:
        raise ValueError(f"max_gap must be >= 0, got {max_gap}")
    hosts = _finite_boxes(hosts)
    attachments = _finite_boxes(attachments)
    h = hosts.select(
        F.col(key), F.col("page"), F.col("host_id"),
        F.col("l").alias("hl"), F.col("t").alias("ht"),
        F.col("r").alias("hr"), F.col("b").alias("hb"),
    )
    a = attachments.select(
        F.col(key), F.col("page"), F.col("attach_id"),
        F.col("l").alias("al"), F.col("t").alias("at"),
        F.col("r").alias("ar"), F.col("b").alias("ab"),
    )
    j = a.join(h, [key, "page"])  # hash equi-join, per-doc-page pairs
    h_overlap = _overlap_1d(F.col("al"), F.col("ar"),
                            F.col("hl"), F.col("hr"))
    gap = (
        F.when(F.col("at") >= F.col("hb"), F.col("at") - F.col("hb"))
        .when(F.col("ht") >= F.col("ab"), F.col("ht") - F.col("ab"))
        .otherwise(F.lit(0.0))
    )
    pos = (
        F.when(F.col("at") >= F.col("hb"), F.lit("below"))
        .when(F.col("ht") >= F.col("ab"), F.lit("above"))
        .otherwise(F.lit("overlap"))
    )
    j = (
        j.filter(h_overlap > 0)
        .withColumn("gap", F.round(gap.cast("double"), 6))
        .withColumn("pos", pos)
    )
    if max_gap is not None:
        j = j.filter(F.col("gap") <= F.lit(float(max_gap)))
    w = Window.partitionBy(key, "page", "attach_id").orderBy(
        F.asc("gap"), F.asc("host_id"))
    return (
        j.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(key, "page", "attach_id", "host_id", "gap", "pos")
    )
