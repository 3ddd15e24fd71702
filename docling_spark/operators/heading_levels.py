"""Heading-hierarchy inference: numbering markers + PDF-bookmark join.

Re-expression of the reference's HeadingHierarchyModel
(docling/models/stages/heading_hierarchy/heading_hierarchy_model.py:87-175
marker parsing/resolution, :278-392 bookmark fuzzy join) as pure DataFrame
ops — every classification is a JVM regexp/when chain, doc-wide ambiguity
resolution is a window aggregate, level compression is a dense_rank, and
the bookmark match is a doc-partitioned equi-join + two ranking windows.
No Python runs per row, so the plan scales to any number of documents:
the only shuffles are the per-doc windows/joins keyed on ``doc_id``.

Known simplification vs the reference (documented): the fuzzy score keeps
the exact-match and containment rules (score 1.0 / 0.92,
heading_hierarchy_model.py:283-295) but drops the SequenceMatcher ratio
component — partial-overlap matches below the containment bar are not
found. SQL-side reproducibility (the correctness oracle) requires the
score to be a closed-form expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# canonical scheme order (heading_hierarchy_model.py:43-52); dotted shares
# the arabic rank and distinguishes by depth
_FAMILY_RANK = {
    "part": 0, "chapter": 1, "article": 2, "roman_u": 3,
    "arabic": 4, "dotted": 4, "alpha_u": 5, "alpha_l": 6, "roman_l": 7,
}

_ROMAN_FULL = (
    r"^[Mm]{0,4}([Cc][Mm]|[Cc][Dd]|[Dd]?[Cc]{0,3})"
    r"([Xx][Cc]|[Xx][Ll]|[Ll]?[Xx]{0,3})"
    r"([Ii][Xx]|[Ii][Vv]|[Vv]?[Ii]{0,3})$"
)
_ROMAN_SINGLES = "IVXLCDM"


def parse_marker(text: Column) -> Column:
    """Leading numbering marker → struct(family, depth, token).

    family ``amb_u``/``amb_l`` marks the single-letter Roman/alpha
    ambiguity that :func:`assign_numbering_levels` resolves doc-wide."""
    s = F.trim(text)
    dotted_tok = F.regexp_extract(s, r"^(\d+(?:\.\d+)+)([.)\]\s]|$)", 1)
    letter_tok = F.regexp_extract(s, r"^\(?\s*([A-Za-z]+)\s*[).]", 1)
    is_upper = letter_tok == F.upper(letter_tok)
    single = F.length(letter_tok) == 1
    single_roman = single & F.upper(letter_tok).isin(*_ROMAN_SINGLES)
    multi_roman = (~single) & letter_tok.rlike(_ROMAN_FULL)

    family = (
        F.when(s.rlike(r"^(?i)(part|title|book)\b"), F.lit("part"))
        .when(s.rlike(r"^(?i)chapter\b"), F.lit("chapter"))
        .when(s.rlike(r"^(?i)(article|section|clause|schedule|annex|appendix|rule)\b")
              | s.rlike(r"^§+\s*\d"), F.lit("article"))
        .when(dotted_tok != "", F.lit("dotted"))
        .when(s.rlike(r"^\d+[.)]"), F.lit("arabic"))
        .when(letter_tok == "", F.lit(None))
        .when(single_roman & is_upper, F.lit("amb_u"))
        .when(single_roman, F.lit("amb_l"))
        .when(single & is_upper, F.lit("alpha_u"))
        .when(single, F.lit("alpha_l"))
        .when(multi_roman & is_upper, F.lit("roman_u"))
        .when(multi_roman, F.lit("roman_l"))
        .otherwise(F.lit(None))
    )
    depth = F.when(
        family == "dotted", F.size(F.split(dotted_tok, r"\."))
    ).otherwise(F.lit(1))
    return F.struct(family.alias("family"), depth.alias("depth"),
                    letter_tok.alias("token"))


def assign_numbering_levels(
    headings: DataFrame, doc_col: str = "doc_id",
    idx_col: str = "heading_idx", text_col: str = "text",
    max_level: int = 6,
) -> DataFrame:
    """(doc, idx, text) → + (family, level): relative, compressed levels
    from numbering markers. Unnumbered headings get family='none',
    level=0 (kept as rows — the caller decides the fallback)."""
    m = parse_marker(F.col(text_col))
    df = headings.withColumn("_m", m).select(
        "*",
        F.col("_m.family").alias("_family"),
        F.col("_m.depth").alias("_depth"),
        F.col("_m.token").alias("_token"),
    ).drop("_m")

    # doc-wide evidence for single-letter Roman/alpha resolution
    # (heading_hierarchy_model.py:133-160)
    wdoc = Window.partitionBy(doc_col)
    has = {
        fam: F.max(F.when(F.col("_family") == fam, 1).otherwise(0)).over(wdoc)
        for fam in ("roman_u", "alpha_u", "roman_l", "alpha_l")
    }
    res_u = (
        F.when(has["roman_u"].eqNullSafe(1) & (has["alpha_u"] == 0), F.lit("roman_u"))
        .when((has["roman_u"] == 0) & (has["alpha_u"] == 1), F.lit("alpha_u"))
        .when(F.upper(F.col("_token")) == "I", F.lit("roman_u"))
        .otherwise(F.lit("alpha_u"))
    )
    res_l = (
        F.when((has["roman_l"] == 1) & (has["alpha_l"] == 0), F.lit("roman_l"))
        .when((has["roman_l"] == 0) & (has["alpha_l"] == 1), F.lit("alpha_l"))
        .when(F.col("_token") == "i", F.lit("roman_l"))
        .otherwise(F.lit("alpha_l"))
    )
    family = (
        F.when(F.col("_family") == "amb_u", res_u)
        .when(F.col("_family") == "amb_l", res_l)
        .otherwise(F.col("_family"))
    )
    df = df.withColumn("_family", family)

    rank = F.create_map(
        *[x for f, r in _FAMILY_RANK.items() for x in (F.lit(f), F.lit(r))]
    )[F.col("_family")]
    df = df.withColumn("_rank", rank)

    # compress the distinct (rank, depth) keys per doc into contiguous
    # levels — dense_rank over marked rows only
    marked = df.filter(F.col("_family").isNotNull())
    wlvl = Window.partitionBy(doc_col).orderBy("_rank", "_depth")
    lev = marked.withColumn(
        "level", F.least(F.dense_rank().over(wlvl), F.lit(max_level))
    ).select(doc_col, idx_col, "_family", "level")
    out = (
        df.drop("_rank", "_depth", "_token", "_family")
        .join(lev, [doc_col, idx_col], "left")
        .select(
            "*",
            F.coalesce(F.col("_family"), F.lit("none")).alias("family"),
            F.coalesce(F.col("level"), F.lit(0)).cast("int").alias("num_level"),
        )
        .drop("_family", "level")
    )
    return out


def _norm_title(c: Column) -> Column:
    """Lower-case, collapse whitespace, trim outer punctuation
    (heading_hierarchy_model.py:266-270)."""
    s = F.lower(F.regexp_replace(c, r"\s+", " "))
    return F.regexp_replace(F.regexp_replace(s, r"^[\W_]+", ""), r"[\W_]+$", "")


_LEADING_MARKER = (
    r"^\s*(?:"
    r"(?i:part|title|book|chapter|article|section|clause|schedule|annex|appendix|rule)"
    r"\b[\s.:]*[0-9ivxlcdmIVXLCDM]*"
    r"|§+\s*[0-9.]+"
    r"|\(?[0-9]+(\.[0-9]+)*[).]?"
    r"|\(?[A-Za-z]{1,2}[).]"
    r")[\s.:)\-]*"
)


def _strip_marker(c: Column) -> Column:
    return F.regexp_replace(c, _LEADING_MARKER, "")


def _pair_score(a_raw: Column, b_raw: Column) -> Column:
    """Fuzzy score in {0, 0.92, 1.0}: exact normalized match across the
    with/without-marker variants → 1.0; containment of one ≥4-char
    variant in the other → 0.92 (heading_hierarchy_model.py:283-295,
    minus the SequenceMatcher component — see module docstring)."""
    a1, a2 = _norm_title(a_raw), _norm_title(_strip_marker(a_raw))
    b1, b2 = _norm_title(b_raw), _norm_title(_strip_marker(b_raw))

    def eq(x, y):
        return (x != "") & (y != "") & (x == y)

    def contains(x, y):
        return (F.length(x) >= 4) & (F.length(y) >= 4) & (
            F.instr(x, y) > 0) | ((F.length(x) >= 4) & (F.length(y) >= 4)
                                  & (F.instr(y, x) > 0))

    exact = eq(a1, b1) | eq(a1, b2) | eq(a2, b1) | eq(a2, b2)
    cont = (contains(a1, b1) | contains(a1, b2)
            | contains(a2, b1) | contains(a2, b2))
    return (F.when(exact, F.lit(1.0)).when(cont, F.lit(0.92))
            .otherwise(F.lit(0.0)))


def bookmark_heading_levels(
    headings: DataFrame, outline: DataFrame,
    doc_col: str = "doc_id", threshold: float = 0.7,
) -> DataFrame:
    """PDF-outline → heading fuzzy join: per bookmark keep the best-scoring
    unclaimed heading (ties → lowest heading_idx), one bookmark per heading,
    then compress the matched bookmark depths per doc into contiguous
    1-based levels.

    Conflict resolution is the reference's SEQUENTIAL greedy
    (heading_hierarchy_model.py:330-361): bookmarks claim in outline
    order; a bookmark whose best heading was claimed by an earlier one
    falls back to its next-best unclaimed heading. Parallel claim
    rounds are NOT equivalent (a later bookmark can snatch in round 1 a
    heading the earlier loser would have taken at its sequential turn),
    so the assignment runs as a bounded per-document kernel: the
    scored+thresholded candidate pairs (the relational part, one
    doc-keyed join) pack into one row per doc and ONE batched
    mapInPandas executes the greedy — candidate counts are bounded by
    outline size, the same per-unit-bounded pattern as scenes/diarize.

    headings: (doc_id, heading_idx, text [, page_no])
    outline:  (doc_id, bm_idx, title, bm_level [, page_no])
    returns:  (doc_id, heading_idx, level)
    """
    h = headings.select(
        F.col(doc_col), F.col("heading_idx"), F.col("text"),
        *([F.col("page_no").alias("h_page")] if "page_no" in headings.columns
          else [F.lit(None).cast("int").alias("h_page")]),
    )
    o = outline.select(
        F.col(doc_col), F.col("bm_idx"), F.col("title"), F.col("bm_level"),
        *([F.col("page_no").alias("b_page")] if "page_no" in outline.columns
          else [F.lit(None).cast("int").alias("b_page")]),
    )
    cand = (
        h.join(o, doc_col)
        .filter(
            F.col("h_page").isNull() | F.col("b_page").isNull()
            | (F.col("h_page") == F.col("b_page"))
        )
        .withColumn("score", _pair_score(F.col("text"), F.col("title")))
        # cross-page matches must clear a stricter bar (+0.1) — the
        # reference raises the threshold only when the BOOKMARK's page
        # is unknown (:337-339); a page-less heading against a paged
        # bookmark keeps the base bar, the reference's own asymmetry
        .withColumn(
            "eff_threshold",
            F.when(F.col("b_page").isNull(), F.lit(min(1.0, threshold + 0.1)))
            .otherwise(F.lit(threshold)),
        )
        .filter(F.col("score") >= F.col("eff_threshold"))
    )
    # pack candidates per doc (struct field order sorts by bm_idx, then
    # score desc via negation, then heading_idx — the exact scan order
    # the sequential greedy needs) and run ONE batched kernel
    import pandas as pd

    doc_type = {f.name: f.dataType.simpleString()
                for f in headings.schema.fields}[doc_col]
    packed = cand.groupBy(doc_col).agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("bm_idx"), (-F.col("score")).alias("neg_score"),
            F.col("heading_idx"), F.col("bm_level")))).alias("cs"))
    packed = packed.repartition(
        headings.sparkSession.sparkContext.defaultParallelism)

    def run(batches):
        for pdf in batches:
            out = {doc_col: [], "heading_idx": [], "bm_level": []}
            for doc, cs in zip(pdf[doc_col], pdf["cs"]):
                claimed: set[int] = set()
                i = 0
                while i < len(cs):
                    bm = cs[i]["bm_idx"]
                    chosen = None
                    while i < len(cs) and cs[i]["bm_idx"] == bm:
                        h = cs[i]["heading_idx"]
                        if chosen is None and h not in claimed:
                            chosen = (h, cs[i]["bm_level"])
                        i += 1
                    if chosen is not None:
                        claimed.add(chosen[0])
                        out[doc_col].append(doc)
                        out["heading_idx"].append(chosen[0])
                        out["bm_level"].append(chosen[1])
            yield pd.DataFrame(out)

    matched = packed.mapInPandas(
        run, f"{doc_col} {doc_type}, heading_idx int, bm_level int")
    # compress raw bookmark depths per doc into contiguous levels
    w_lvl = Window.partitionBy(doc_col).orderBy("bm_level")
    return matched.select(
        doc_col, "heading_idx",
        F.dense_rank().over(w_lvl).cast("int").alias("level"),
    )
