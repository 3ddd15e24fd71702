"""Unit semantics of the spatial attachment join (operators/spatial.py).

Pins attach_nearest edge cases the contract query can't reach: vertical
overlap → gap 0, equal-gap tie-break by host_id, the max_gap cutoff,
and page isolation (an attachment never binds across pages).
"""

from docling_spark.operators.spatial import attach_nearest, containment_join


def test_containment_join_page_scoped(spark):
    # page-local coordinates: the page-7 cell at (0,0,100,100) must NOT
    # capture the page-2 picture even though both share the doc key
    parents = spark.createDataFrame(
        [(1, 2, 0, 200.0, 200.0, 300.0, 300.0),
         (1, 7, 1, 0.0, 0.0, 100.0, 100.0)],
        "doc_id int, page int, parent_id int, "
        "l double, t double, r double, b double")
    children = spark.createDataFrame(
        [(1, 2, 0, 10.0, 10.0, 60.0, 60.0)],
        "doc_id int, page int, child_id int, "
        "l double, t double, r double, b double")
    got = containment_join(parents, children).collect()
    assert got == []  # page-2 cell doesn't cover it; page-7 is out of scope

    # page-less inputs keep the doc-only join (legacy contract)
    got2 = containment_join(
        parents.drop("page"), children.drop("page")).collect()
    assert len(got2) == 1 and got2[0].parent_id == 1


def _df(spark, rows, id_col):
    return spark.createDataFrame(
        rows, f"doc_id int, page int, {id_col} int, "
              "l double, t double, r double, b double")


def test_overlap_gap_zero_and_tiebreak(spark):
    hosts = _df(spark, [
        (1, 0, 5, 0.0, 100.0, 100.0, 200.0),   # overlaps attachment
        (1, 0, 7, 0.0, 100.0, 100.0, 200.0),   # identical geometry
    ], "host_id")
    att = _df(spark, [(1, 0, 0, 10.0, 150.0, 90.0, 160.0)], "attach_id")
    got = attach_nearest(hosts, att).collect()
    assert len(got) == 1
    row = got[0]
    assert (row.host_id, row.gap, row.pos) == (5, 0.0, "overlap")


def test_max_gap_cutoff(spark):
    hosts = _df(spark, [(1, 0, 0, 0.0, 0.0, 100.0, 10.0)], "host_id")
    att = _df(spark, [(1, 0, 0, 0.0, 60.0, 100.0, 70.0)], "attach_id")
    assert attach_nearest(hosts, att, max_gap=49.0).count() == 0
    kept = attach_nearest(hosts, att, max_gap=50.0).collect()
    assert len(kept) == 1 and kept[0].pos == "below"


def test_page_isolation(spark):
    # the only host lives on page 1; the attachment on page 0 stays free
    hosts = _df(spark, [(1, 1, 0, 0.0, 0.0, 100.0, 10.0)], "host_id")
    att = _df(spark, [(1, 0, 0, 0.0, 20.0, 100.0, 30.0)], "attach_id")
    assert attach_nearest(hosts, att).count() == 0


def test_same_attach_id_on_two_pages(spark):
    # attach ids are page-scoped: the same id on two pages must yield
    # one attachment PER PAGE (regression: a window keyed only on
    # (doc, attach_id) collapsed these to a single row)
    hosts = _df(spark, [
        (1, 0, 0, 0.0, 0.0, 100.0, 10.0),
        (1, 1, 1, 0.0, 0.0, 100.0, 10.0),
    ], "host_id")
    att = _df(spark, [
        (1, 0, 0, 0.0, 15.0, 100.0, 25.0),   # gap 5 on page 0
        (1, 1, 0, 0.0, 13.0, 100.0, 23.0),   # gap 3 on page 1
    ], "attach_id")
    got = {(r.page, r.attach_id): (r.host_id, r.gap)
           for r in attach_nearest(hosts, att).collect()}
    assert got == {(0, 0): (0, 5.0), (1, 0): (1, 3.0)}


def test_above_prefers_nearest(spark):
    # attachment sits between two hosts; the lower host is nearer, and
    # the attachment is *above* it
    hosts = _df(spark, [
        (1, 0, 0, 0.0, 0.0, 100.0, 10.0),      # 30 above attachment
        (1, 0, 1, 0.0, 60.0, 100.0, 70.0),     # 10 below attachment
    ], "host_id")
    att = _df(spark, [(1, 0, 0, 0.0, 40.0, 100.0, 50.0)], "attach_id")
    got = attach_nearest(hosts, att).collect()
    assert len(got) == 1
    assert (got[0].host_id, got[0].gap, got[0].pos) == (1, 10.0, "above")


class TestSpatialReviewFixes:
    def test_null_edge_parent_never_wins(self, spark):
        """greatest/least SKIP nulls, so an edge-less parent rect used to
        act as an infinite box and beat the true container at 1.0."""
        from docling_spark.operators.spatial import containment_join

        parents = spark.createDataFrame(
            [(1, 0, 0.0, 0.0, None, None),
             (1, 1, 0.0, 0.0, 100.0, 100.0)],
            "doc_id long, parent_id long, l double, t double, "
            "r double, b double")
        children = spark.createDataFrame(
            [(1, 7, 10.0, 10.0, 60.0, 60.0)],
            "doc_id long, child_id long, l double, t double, "
            "r double, b double")
        out = containment_join(parents, children).collect()
        assert len(out) == 1 and out[0]["parent_id"] == 1

    def test_null_uri_links_dropped(self, spark):
        from docling_spark.operators.spatial import hyperlink_attach

        items = spark.createDataFrame(
            [(1, 1, 5, 0.0, 0.0, 100.0, 10.0)],
            "doc_id long, page long, item_id long, l double, t double, "
            "r double, b double")
        links = spark.createDataFrame(
            [(1, 1, None, 0.0, 0.0, 100.0, 10.0),
             (1, 1, "https://real/", 0.0, 0.0, 100.0, 10.0)],
            "doc_id long, page long, uri string, l double, t double, "
            "r double, b double")
        out = hyperlink_attach(items, links).collect()
        assert len(out) == 1 and out[0]["uri"] == "https://real/"

    def test_zero_threshold_still_requires_overlap(self, spark):
        from docling_spark.operators.spatial import containment_join

        parents = spark.createDataFrame(
            [(1, 0, 0.0, 0.0, 10.0, 10.0)],
            "doc_id long, parent_id long, l double, t double, "
            "r double, b double")
        children = spark.createDataFrame(
            [(1, 7, 50.0, 50.0, 60.0, 60.0)],  # no overlap at all
            "doc_id long, child_id long, l double, t double, "
            "r double, b double")
        assert containment_join(parents, children,
                                min_coverage=0.0).count() == 0

    def test_attach_nearest_rejects_negative_gap_and_null_host(self, spark):
        import pytest

        from docling_spark.operators.spatial import attach_nearest

        hosts = spark.createDataFrame(
            [(1, 1, 0, 0.0, None, 100.0, None),     # malformed host
             (1, 1, 1, 0.0, 380.0, 100.0, 395.0)],  # true nearest
            "doc_id long, page long, host_id long, l double, t double, "
            "r double, b double")
        atts = spark.createDataFrame(
            [(1, 1, 9, 10.0, 400.0, 90.0, 410.0)],
            "doc_id long, page long, attach_id long, l double, t double, "
            "r double, b double")
        out = attach_nearest(hosts, atts).collect()
        assert len(out) == 1 and out[0]["host_id"] == 1
        with pytest.raises(ValueError, match="max_gap"):
            attach_nearest(hosts, atts, max_gap=-1)
