"""Picture classifier/description post operators — the deterministic
shells around the reference's two picture VLM stages
(document_picture_classifier.py:170-210,
picture_description_base_model.py:66-174)."""

from __future__ import annotations

from docling_spark.operators.picture_post import (
    attach_descriptions,
    classify_picture_scores,
    describe_picture_gate,
)


def _scores(spark):
    return spark.createDataFrame(
        [
            (1, 0, "chart", 0.7),
            (1, 0, "logo", 0.9),
            (1, 0, "diagram", 0.7),  # ties with chart → class_name asc
            (2, 0, "logo", 0.4),
        ],
        "doc_id long, item_idx int, class_name string, confidence double",
    )


def test_classify_orders_predictions(spark):
    got = {(r.doc_id, r.item_idx): r
           for r in classify_picture_scores(_scores(spark)).collect()}
    r10 = got[(1, 0)]
    assert [p.class_name for p in r10.predictions] == \
        ["logo", "chart", "diagram"]
    assert r10.top_class == "logo" and r10.top_confidence == 0.9
    assert got[(2, 0)].top_class == "logo"


def _pics(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, item_idx int, l double, t double, r double, "
        "b double, page_w double, page_h double",
    )


def test_gate_area_threshold_first(spark):
    # a denied-class picture below the area threshold reports small_area:
    # the reference tests area BEFORE classification (base model :79-97)
    pics = _pics(spark, [
        (1, 0, 0.0, 0.0, 10.0, 10.0, 612.0, 792.0),   # tiny
        (1, 1, 0.0, 0.0, 400.0, 700.0, 612.0, 792.0),  # big
        (2, 0, 0.0, 0.0, 10.0, 10.0, 0.0, 0.0),        # zero page area
    ])
    cls = classify_picture_scores(spark.createDataFrame(
        [(1, 0, "logo", 0.99), (1, 1, "chart", 0.9)],
        "doc_id long, item_idx int, class_name string, confidence double"))
    got = {(r.doc_id, r.item_idx): (r.describe, r.skip_reason)
           for r in describe_picture_gate(
               pics, cls, allow=["chart"], deny=["logo"],
               min_confidence=0.5).collect()}
    assert got[(1, 0)] == (False, "small_area")
    assert got[(1, 1)] == (True, None)
    # zero page area: the fraction is unprovable → area rule passes, but
    # allow-list + no predictions → allow is not None → classification skip
    assert got[(2, 0)] == (False, "classification")


def test_gate_allow_deny_min_confidence(spark):
    pics = _pics(spark, [
        (1, i, 0.0, 0.0, 400.0, 700.0, 612.0, 792.0) for i in range(4)
    ])
    cls = classify_picture_scores(spark.createDataFrame(
        [
            (1, 0, "logo", 0.3),   # deny hit BELOW min_conf → not denied,
            (1, 0, "chart", 0.8),  # allowed confidently → describe
            (1, 1, "logo", 0.9),   # confident deny beats confident allow
            (1, 1, "chart", 0.8),
            (1, 2, "chart", 0.2),  # allowed but under min_conf → skip
        ],
        "doc_id long, item_idx int, class_name string, confidence double"))
    got = {r.item_idx: (r.describe, r.skip_reason)
           for r in describe_picture_gate(
               pics, cls, allow=["chart"], deny=["logo"],
               min_confidence=0.5).collect()}
    assert got[0] == (True, None)
    assert got[1] == (False, "classification")
    assert got[2] == (False, "classification")
    # item 3 has NO predictions and allow is set → skip
    assert got[3] == (False, "classification")


def test_gate_no_lists_passes_everything(spark):
    pics = _pics(spark, [(1, 0, 0.0, 0.0, 400.0, 700.0, 612.0, 792.0)])
    got = describe_picture_gate(pics).collect()
    assert (got[0].describe, got[0].skip_reason) == (True, None)


def test_gate_deny_only_no_predictions_passes(spark):
    # allow is None + no predictions → pass (reference: return allow is None)
    pics = _pics(spark, [(1, 0, 0.0, 0.0, 400.0, 700.0, 612.0, 792.0)])
    got = describe_picture_gate(pics, deny=["logo"]).collect()
    assert got[0].describe is True


def test_attach_descriptions_only_admitted(spark):
    gated = spark.createDataFrame(
        [(1, 0, True, None), (1, 1, False, "small_area")],
        "doc_id long, item_idx int, describe boolean, skip_reason string")
    texts = spark.createDataFrame(
        [(1, 0, "a bar chart"), (1, 1, "never used")],
        "doc_id long, item_idx int, text string")
    got = attach_descriptions(gated, texts, provenance="test").collect()
    assert len(got) == 1
    assert (got[0].item_idx, got[0].description, got[0].created_by) == \
        (0, "a bar chart", "test")
