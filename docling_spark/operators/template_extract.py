"""Templated key-value extraction — the reference's second extraction API.

Docling exposes ``DocumentExtractor.extract(source, template)``
(document_extractor.py:127-146): a template (str / dict / pydantic model)
is serialized to a prompt and a VLM fills it per page, yielding one
``ExtractedPageData(page_no, extracted_data, raw_text, errors)`` per page
(extraction_vlm_pipeline.py:96-141, datamodel/extraction.py:11-36).
The model inference is the boundary; the *semantics* are "find the value
each template field takes on each page, typed".

Here that surface is re-expressed declaratively — no model, no Python
kernel, no UDF.  A text payload is a sequence of ``key: value`` /
``key = value`` lines (the deterministic stand-in for what the VLM reads
off the page image); the plan is:

    split pages (form-feed) → posexplode lines → regexp KV parse
    → normalize key → broadcast-join the (tiny) template dimension
    → typed coercion via try_cast/CASE → first match per (doc, page, field)

Every step is a JVM Column expression inside whole-stage codegen; the
only shuffle is the first-occurrence window, keyed by (id, page, field).
The template dim is broadcast (a handful of rows), so at 10^12 turns the
plan is scan → narrow ops → one keyed window — no skew surface beyond
the input's own conversation skew, which upstream salting already handles.

Type coercion mirrors the reference's "parse the extracted text as JSON
if possible" contract (extraction_vlm_pipeline.py:115-119): a value that
does not parse as the declared type keeps its raw capture, gets
``ok=false``, and never poisons the row (per-page error containment,
extraction_vlm_pipeline.py:136-141).

``template=None`` mirrors the reference's default prompt ("Extract all
text and structured information", extraction_vlm_pipeline.py:93-94):
every detected KV pair is returned untyped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# line shape: "Some Key: value" / "some_key = value"; key at most 64 chars,
# at least one non-separator char; value must contain a non-space char.
_KV_RE = r"^\s*([^:=\n]{1,64}?)\s*[:=]\s*(.*\S)\s*$"

SUPPORTED_TYPES = ("str", "int", "float", "bool", "date")


def normalize_field(c):
    """Field-name canon: casefold, non-alphanumeric runs → single space.
    'Invoice No' / 'invoice_no' / 'INVOICE-NO' all meet at 'invoice no'."""
    return F.trim(F.regexp_replace(F.lower(c), r"[^0-9a-z]+", " "))


def template_dim(spark: SparkSession, template: dict[str, str]) -> DataFrame:
    """The template as a tiny broadcastable dimension (field, ftype)."""
    bad = {t for t in template.values()} - set(SUPPORTED_TYPES)
    if bad:
        raise ValueError(f"unsupported template types: {sorted(bad)}; "
                         f"supported: {SUPPORTED_TYPES}")
    # validate the NORMALIZED field names too: two keys meeting at one
    # canonical form would join the same line twice with a tie-broken
    # (nondeterministic) type, and a key normalizing to '' could never
    # match any line — both are template authoring errors, raised here
    import re as _re

    seen: dict[str, str] = {}
    for k in template:
        canon = _re.sub(r"[^0-9a-z]+", " ", k.lower()).strip()
        if not canon:
            raise ValueError(
                f"template field {k!r} normalizes to an empty name and "
                "can never match a document line")
        if canon in seen:
            raise ValueError(
                f"template fields {seen[canon]!r} and {k!r} both "
                f"normalize to {canon!r} — merge them or rename one")
        seen[canon] = k
    rows = [(k, v) for k, v in template.items()]
    dim = spark.createDataFrame(rows, "field string, ftype string")
    return dim.select(normalize_field("field").alias("field"), "ftype")


def _coerce(value, ftype):
    """Typed canonical string per declared type; NULL = coercion failure.

    Canon forms are stable across engines: ints in plain decimal, floats
    at fixed 6dp, bools as true/false, dates as ISO yyyy-MM-dd.
    """
    as_int = value.try_cast("bigint")
    as_dbl = value.try_cast("double")
    low = F.lower(value)
    as_bool = (
        F.when(low.isin("true", "yes", "1"), F.lit("true"))
        .when(low.isin("false", "no", "0"), F.lit("false"))
    )
    as_date = F.date_format(value.try_cast("date"), "yyyy-MM-dd")
    return (
        F.when(ftype == "str", value)
        .when(ftype == "int", as_int.cast("string"))
        .when(ftype == "float", F.when(as_dbl.isNotNull(),
                                       F.format_string("%.6f", as_dbl)))
        .when(ftype == "bool", as_bool)
        .when(ftype == "date", as_date)
    )


def extract_templated(
    df: DataFrame,
    template: dict[str, str] | None = None,
    text_col: str = "extracted_text",
    id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """One row per (id…, page_no, field) found: the page-granular analog of
    ``ExtractedPageData.extracted_data`` (datamodel/extraction.py:11-23),
    exploded to rows so results stay hash-friendly and joinable.

    Pages are form-feed-separated segments of ``text_col`` (page_no is
    1-indexed, matching the reference). Within a page the FIRST line that
    matches a template field wins — later repeats are ignored, the moral
    equivalent of the VLM reporting one value per field per page.

    Output: ``id_cols…, page_no int, field string, value_raw string,
    value string (typed canon; NULL when coercion failed), ok boolean``.
    With ``template=None``, all detected keys are returned with
    ``value = value_raw`` and ``ok = true`` (default-prompt mode).
    """
    ids = [F.col(c) for c in id_cols]

    pages = df.select(
        *ids,
        F.posexplode(F.split(F.col(text_col), "\f")).alias("page_idx", "page_text"),
    ).select(*ids, (F.col("page_idx") + 1).alias("page_no"), "page_text")

    lines = pages.select(
        *ids, "page_no",
        F.posexplode(F.split(F.col("page_text"), "\n")).alias("line_no", "line"),
    )

    kv = lines.select(
        *ids, "page_no", "line_no",
        normalize_field(F.regexp_extract("line", _KV_RE, 1)).alias("key"),
        F.regexp_extract("line", _KV_RE, 2).alias("value_raw"),
    ).filter(F.col("key") != "")

    if template is None:
        matched = kv.select(
            *ids, "page_no", "line_no", F.col("key").alias("field"),
            "value_raw", F.col("value_raw").alias("value"),
        )
    else:
        dim = template_dim(df.sparkSession, template)
        matched = kv.join(
            F.broadcast(dim), kv["key"] == dim["field"], "inner"
        ).select(
            *ids, "page_no", "line_no", "field", "value_raw",
            _coerce(F.col("value_raw"), F.col("ftype")).alias("value"),
        )

    first = Window.partitionBy(*id_cols, "page_no", "field").orderBy("line_no")
    return (
        matched.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .select(*id_cols, "page_no", "field", "value_raw",
                "value", F.col("value").isNotNull().alias("ok"))
    )
