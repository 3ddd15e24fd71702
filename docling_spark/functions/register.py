"""SQL-surface registration: expose the engine's scalar kernels as named
functions usable from ``spark.sql`` — the reference's pluggable-stage
registry re-expressed as a UDF registry (docling/models/factories/,
SURVEY.md §2.j: ``spark.udf.register`` for SQL exposure).

``extract_text`` / ``detect_payload_format`` are Arrow-batched pandas UDFs
wrapping the same kernels as the mapInPandas operator; ``normalize_text``
is the pure-python normalizer (its JVM Column twin lives in text_sql.py
for plans built through the DataFrame API).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def register_sql_udfs(spark: SparkSession) -> None:
    """Idempotently register the SQL-facing functions on this session."""

    @pandas_udf(T.StringType())
    def extract_text(text: pd.Series, tool: pd.Series) -> pd.Series:
        from docling_spark.engine.extract import extract_payload

        return pd.Series(
            [
                extract_payload(t if t is None or isinstance(t, str) else str(t),
                                o or "")["extracted_text"]
                for t, o in zip(text, tool)
            ]
        )

    @pandas_udf(T.StringType())
    def detect_payload_format(text: pd.Series, tool: pd.Series) -> pd.Series:
        from docling_spark.engine.extract import detect_format

        return pd.Series(
            [detect_format(t or "", o or "") for t, o in zip(text, tool)]
        )

    @pandas_udf(T.StringType())
    def normalize_text(text: pd.Series) -> pd.Series:
        from docling_spark.functions.textnorm import normalize_plain

        return pd.Series([normalize_plain(t or "") for t in text])

    spark.udf.register("extract_text", extract_text)
    spark.udf.register("detect_payload_format", detect_payload_format)
    spark.udf.register("normalize_text", normalize_text)

    # canonical_url: a pure SQL scalar function (CREATE FUNCTION ...
    # RETURN <expr>) — stays JVM-side inside whole-stage codegen, unlike
    # the pandas UDFs above. Mirrors operators/webquality.canonical_url
    # step for step; tests/test_webquality.py pins SQL ≡ Column parity.
    spark.sql(r"""
CREATE OR REPLACE TEMPORARY FUNCTION canonical_url(url STRING)
RETURNS STRING
RETURN regexp_replace(
  (SELECT CASE WHEN q = '' THEN b
          ELSE concat(b, '?', array_join(array_sort(split(q, '&')), '&'))
          END
   FROM (SELECT regexp_extract(u, '^([^?]*)', 1) AS b,
                regexp_extract(u, '\\?(.*)$', 1) AS q
         FROM (SELECT regexp_replace(regexp_replace(regexp_replace(
                        regexp_replace(regexp_replace(regexp_replace(
                          regexp_replace(
                            concat(
                              lower(regexp_extract(url,
                                    '^([a-zA-Z]+://[^/?#]*)', 1)),
                              regexp_replace(url,
                                    '^[a-zA-Z]+://[^/?#]*', '')),
                            '#.*$', ''),
                          '^(http://[^/?#:]*):80(/|\\?|$)', '$1$2'),
                        '^(https://[^/?#:]*):443(/|\\?|$)', '$1$2'),
                      '([?&])(utm_[a-z]+|fbclid|gclid|msclkid|ref|sessionid|phpsessid)=[^&#]*',
                      '$1'),
                    '\\?&+', '?'), '&&+', '&'), '[?&]+$', '') AS u))),
  '^([a-z]+://[^/?#]+/.+?)/(\\?|$)', '$1$2')
""")
