"""Picture classifier / picture description post-operators.

The reference wraps two VLM/CNN inference engines in deterministic
shells:

- picture classification (docling/models/stages/picture_classifier/
  document_picture_classifier.py:170-210): the engine emits
  (label_ids, scores) per picture; the shell maps ids to class names,
  builds the ordered prediction list, and stores it on the picture's
  meta.classification;
- picture description (docling/models/picture_description_base_model.py:
  66-127 + datamodel/pipeline_options.py:726-765): BEFORE any inference,
  pictures are gated deterministically — area fraction of the page below
  ``picture_area_threshold`` (default 0.05) skips, then the
  classification allow/deny/min-confidence rule ``_passes_classification``
  (:143-174) decides; surviving pictures get the generated text attached
  as meta.description.

The inference engines themselves are model-weight boundaries (no
torch/transformers in this environment — same stubbed boundary as
charts/code_formula/OCR): scores and description texts arrive as COLUMNS;
everything the reference does deterministically around them is
re-expressed here as JVM column algebra. Scale shape: per-row expressions
plus one (doc_id, item_idx) equi-join for the description attach — no
shuffle wider than the join key, linear at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def classify_picture_scores(scores: DataFrame) -> DataFrame:
    """Engine scores → ordered prediction lists per picture.

    Input: one row per (picture, class) — ``(doc_id, item_idx,
    class_name, confidence)`` — the flattened form of the engine's
    (label_ids, scores) batches. Output: one row per picture —
    ``(doc_id, item_idx, predictions array<struct<class_name,
    confidence>>, top_class, top_confidence)`` — predictions ordered by
    confidence desc then class_name asc (the reference keeps raw engine
    order, which is engine-implementation-defined; a pinned deterministic
    order is strictly better for a distributed engine).

    One groupBy on the picture key; partial aggregation keeps the shuffle
    at the prediction list per picture (class vocabularies are small).
    """
    structd = F.struct(
        (-F.col("confidence")).alias("_negconf"),
        F.col("class_name").alias("class_name"),
        F.col("confidence").alias("confidence"),
    )
    agg = scores.groupBy("doc_id", "item_idx").agg(
        F.array_sort(F.collect_list(structd)).alias("_sorted")
    )
    preds = F.transform(
        F.col("_sorted"),
        lambda s: F.struct(
            s["class_name"].alias("class_name"),
            s["confidence"].alias("confidence"),
        ),
    )
    return agg.select(
        "doc_id",
        "item_idx",
        preds.alias("predictions"),
        F.element_at(preds, 1)["class_name"].alias("top_class"),
        F.element_at(preds, 1)["confidence"].alias("top_confidence"),
    )


def _passes_classification_col(
    predictions,
    allow: list[str] | None,
    deny: list[str] | None,
    min_confidence: float,
):
    """Column twin of the reference's ``_passes_classification``
    (picture_description_base_model.py:143-174), null-prediction cases
    included: no allow AND no deny → pass; no predictions → pass iff
    allow is None; deny hit (confident) → fail; allow set → pass iff some
    confident prediction is allowed."""
    if not allow and not deny:
        return F.lit(True)
    empty = predictions.isNull() | (F.size(predictions) == 0)
    conf_ok = (
        (lambda p: F.lit(True))
        if min_confidence <= 0
        else (lambda p: p["confidence"].isNotNull()
              & (p["confidence"] >= F.lit(min_confidence)))
    )
    verdict = F.lit(True)
    if allow:
        allow_arr = F.array(*[F.lit(a) for a in allow])
        verdict = F.exists(
            predictions,
            lambda p: conf_ok(p) & F.array_contains(allow_arr, p["class_name"]),
        )
    if deny:
        deny_arr = F.array(*[F.lit(d) for d in deny])
        verdict = F.when(
            F.exists(
                predictions,
                lambda p: conf_ok(p)
                & F.array_contains(deny_arr, p["class_name"]),
            ),
            F.lit(False),
        ).otherwise(verdict)
    # no predictions: passes unless an allow-list constrains the gate —
    # `not allow` (not `allow is None`) so allow=[] means "no allow
    # constraint" here exactly as it does in the `if allow:` branch above
    return F.when(empty, F.lit(not allow)).otherwise(verdict)


def describe_picture_gate(
    pictures: DataFrame,
    classifications: DataFrame | None = None,
    picture_area_threshold: float = 0.05,
    allow: list[str] | None = None,
    deny: list[str] | None = None,
    min_confidence: float = 0.0,
) -> DataFrame:
    """The deterministic pre-inference gate of the description stage.

    ``pictures``: one row per picture — ``(doc_id, item_idx, l, t, r, b,
    page_w, page_h)`` (top-left-origin page geometry, the picture's
    provenance bbox). ``classifications``: optional
    :func:`classify_picture_scores` output to join the allow/deny rule
    against. Output: input keys + ``describe`` boolean +
    ``skip_reason`` (``small_area`` / ``classification`` / null).

    Rule order matches the reference exactly (base_model.__call__:79-97):
    the area test runs first — a picture under the threshold is skipped
    without consulting classification — then the allow/deny rule.
    Missing/zero page size keeps ``describe`` (the reference only skips
    when it can PROVE the fraction is small).
    """
    out = pictures
    if classifications is not None:
        out = out.join(
            classifications.select("doc_id", "item_idx", "predictions"),
            ["doc_id", "item_idx"],
            "left",
        )
    else:
        out = out.withColumn(
            "predictions",
            F.lit(None).cast(
                "array<struct<class_name:string,confidence:double>>"),
        )
    page_area = F.col("page_w") * F.col("page_h")
    frac = ((F.col("r") - F.col("l")) * (F.col("b") - F.col("t"))) / page_area
    small = (
        page_area.isNotNull()
        & (page_area > 0)
        & (frac < F.lit(picture_area_threshold))
    )
    passes_cls = _passes_classification_col(
        F.col("predictions"), allow, deny, min_confidence)
    return out.select(
        "doc_id",
        "item_idx",
        F.when(small, F.lit(False))
        .when(~passes_cls, F.lit(False))
        .otherwise(F.lit(True))
        .alias("describe"),
        F.when(small, F.lit("small_area"))
        .when(~passes_cls, F.lit("classification"))
        .otherwise(F.lit(None).cast("string"))
        .alias("skip_reason"),
    )


def attach_descriptions(
    gated: DataFrame,
    descriptions: DataFrame,
    provenance: str = "picture_description",
) -> DataFrame:
    """Attach generated texts to the pictures the gate admitted — the
    annotation step of picture_description_base_model.py:102-127 with the
    inference engine stubbed out (``descriptions`` carries the generated
    ``text`` per picture key, however it was produced).

    Output: one row per gated-in picture — ``(doc_id, item_idx,
    description, created_by)``; ``description`` is null when the engine
    produced nothing for an admitted picture (visible, not dropped —
    a lost answer should be seen downstream).
    """
    return (
        gated.filter(F.col("describe"))
        .join(
            descriptions.select(
                "doc_id", "item_idx", F.col("text").alias("description")),
            ["doc_id", "item_idx"],
            "left",
        )
        .select(
            "doc_id", "item_idx", "description",
            F.lit(provenance).alias("created_by"),
        )
    )
