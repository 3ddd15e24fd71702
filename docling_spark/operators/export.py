"""Export operators: alternative sinks over the extracted item table.

The md text is produced at extraction time (the primary sink); DocTags and
itxt are derived from the ``items`` column with one more Arrow-batched
pass — the reference's multi-OutputFormat export loop
(docling/cli/main.py:489-593) as a column transformation. Per-row, no
shuffle; serialization cost is linear in item count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from docling_spark.engine.serialize import (
    serialize_docling_json,
    serialize_doctags,
    serialize_html,
    serialize_html_split_page,
    serialize_itxt,
)


def _serialize_yaml(items: list[dict]) -> str:
    """OutputFormat.YAML: delegate to the engine sink (one definition;
    docling-core save_as_yaml dump settings, round-trips through
    jsonx.extract_docling_yaml)."""
    from docling_spark.engine.serialize import serialize_yaml

    return serialize_yaml(items)


def _serialize_doclang(items: list[dict]) -> str:
    from docling_spark.engine.doclangx import serialize_doclang

    return serialize_doclang(items)


def _serialize_dclx_b64(items: list[dict]) -> str:
    """OutputFormat.DCLX: zip archive holding the .dclg, base64'd so it
    travels in a string column (binary payload convention)."""
    import base64
    import io
    import zipfile

    from docling_spark.engine.doclangx import serialize_doclang

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("document.dclg", serialize_doclang(items))
    return base64.b64encode(buf.getvalue()).decode()


_SERIALIZERS = {
    "doctags": serialize_doctags,
    "itxt": serialize_itxt,
    "html": serialize_html,
    "html_split_page": serialize_html_split_page,
    "json": serialize_docling_json,
    "yaml": _serialize_yaml,
    "doclang": _serialize_doclang,
    "dclx": _serialize_dclx_b64,
}


# integer item fields: Arrow→pandas lifts nullable int struct fields
# to float (2 → 2.0, null → NaN); restore engine-side types so the
# serializers see what the engine produced
_INT_ITEM_KEYS = frozenset(
    {"item_idx", "parent_idx", "level", "span_start", "span_end",
     "page_no", "_hlevel", "_start", "_cap_ref", "num_rows", "num_cols"})
_BOOL_ITEM_KEYS = frozenset({"_inline", "_table_caption"})


def clean_item(it) -> dict:
    """Spark items struct → engine-shaped dict: drop null fields (the
    serializers distinguish absent from present — ``"num_rows" in it``,
    ``.get("_start", 1)`` — and a struct materializes every field), undo
    Arrow's nullable-int→float lift, and unpack the stringified
    ``extras`` map (extract.py _project_item) back into typed keys.
    EVERY consumer feeding Spark items back into the engine serializers
    must route through this."""
    out = {}
    extras = None
    for k, v in dict(it).items():
        if k == "extras":
            extras = v
            continue
        if v is None or (isinstance(v, float) and v != v):
            continue
        if k in _INT_ITEM_KEYS and isinstance(v, float):
            v = int(v)
        out[k] = v
    if extras:
        for k, v in extras.items():
            if k in _INT_ITEM_KEYS:
                out[k] = int(v)
            elif k in _BOOL_ITEM_KEYS:
                out[k] = v == "True"
            else:
                out[k] = v
    return out


def export_items(extracted: DataFrame, fmt: str = "doctags",
                 keep_cols: tuple[str, ...] = ("conv_id", "turn_idx")) -> DataFrame:
    """(keep_cols..., items) → (keep_cols..., <fmt> string column)."""
    ser = _SERIALIZERS[fmt]
    cols = [c for c in keep_cols if c in extracted.columns]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: pdf[c].tolist() for c in cols}
            rendered = []
            for items in pdf["items"]:
                its = ([clean_item(it) for it in items]
                       if items is not None else [])
                # always consult the serializer: each format defines its
                # own empty-document representation (json/yaml/dclx must
                # stay parseable for items == []; "" would not be)
                rendered.append(ser(its))
            out[fmt] = rendered
            yield pd.DataFrame(out)

    # keep-column types come from the input schema, not a name heuristic
    # (ADVICE r1: hardcoding string-only-for-conv_id broke any caller
    # passing another string column)
    in_types = {f.name: f.dataType.simpleString() for f in extracted.schema.fields}
    schema = ", ".join(
        [f"{c} {in_types[c]}" for c in cols] + [f"{fmt} string"]
    )
    return extracted.select(*cols, "items").mapInPandas(run, schema=schema)


def conversations_to_vtt(turns: DataFrame, text_col: str = "text",
                         cue_seconds: int = 5,
                         segment_size: int = 1024) -> DataFrame:
    """Transcript-native VTT sink (OutputFormat.VTT,
    docling/cli/main.py:577-580 save_as_vtt): one WEBVTT document per
    conversation — cue per turn at a fixed cadence, ``<v role>`` voice
    spans, newlines in the payload flattened to spaces (a VTT cue ends at
    the first blank line). The output re-parses with engine/vttx.py
    (tests/test_export_vtt.py round-trip).

    All-JVM: the cue string is a per-row column expression; assembly is
    the same memory-bounded two-level fold as assemble_conversations
    (level 1 ≤ ``segment_size`` structs per collected array), so a
    10^6-turn conversation never materializes per-turn structs in one
    executor buffer.
    """
    from pyspark.sql import functions as F

    start = (F.col("turn_idx").cast("long") * cue_seconds).cast("double")
    end = start + F.lit(float(cue_seconds))

    def tc(sec):
        return F.format_string(
            "%02d:%02d:%06.3f",
            F.floor(sec / 3600).cast("int"),
            F.floor((sec % 3600) / 60).cast("int"),
            (sec % 60),
        )

    # null-proof every concat leg: a null role (extract_ops fills None
    # when the source lacks the column) or null text would null the
    # whole cue, which array_join then silently drops while n_cues
    # still counts it — the document would lose content with clean
    # accounting
    cue = F.concat(
        tc(start), F.lit(" --> "), tc(end),
        F.lit("\n<v "), F.coalesce(F.col("role"), F.lit("speaker")),
        F.lit(">"),
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")),
                         "\n", " "),
    )
    seg = F.floor(F.col("turn_idx") / F.lit(segment_size)).alias("segment")
    level1 = turns.select(
        "conv_id", "turn_idx", seg, cue.alias("cue")
    ).groupBy("conv_id", "segment").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct(F.col("turn_idx"), F.col("cue")))
            ).getField("cue"),
            "\n\n",
        ).alias("segment_text"),
        F.count("*").alias("n_cues"),
    )
    return level1.groupBy("conv_id").agg(
        F.concat(
            F.lit("WEBVTT\n\n"),
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("segment"), F.col("segment_text"))
                    )
                ).getField("segment_text"),
                "\n\n",
            ),
        ).alias("vtt_text"),
        F.sum("n_cues").alias("n_cues"),
    )
