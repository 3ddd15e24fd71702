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

from docling_spark.engine.serialize import serialize_doctags, serialize_itxt

_SERIALIZERS = {"doctags": serialize_doctags, "itxt": serialize_itxt}


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
                its = [dict(it) for it in items] if items is not None else []
                rendered.append(ser(its) if its else "")
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
