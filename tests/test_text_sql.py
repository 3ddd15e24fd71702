"""Parity between the JVM Column twins (functions/text_sql.py) and the
python kernels (functions/textnorm.py) over the corpus dirt charset and
quality-garbage patterns."""

import pytest
from pyspark.sql import functions as F

from docling_spark.functions import textnorm
from docling_spark.functions.text_sql import (
    normalize_plain_col,
    rate_text_quality_col,
)

DIRT_CASES = [
    "plain words only",
    "non breaking space",
    "zero​width‌and‍joiners﻿",
    "dashes ‐‑‒–—― here",
    "quotes ‘x’ “y” done",
    "ellipsis… and soft­hyphen",
    "narrow space and word⁠joiner",
    "ligatures: ﬁ eld ﬂow aﬃx ﬅop Ĳsselmeer ĳs",
    "ﬁ über ﬂ äche",  # non-ASCII \w: Java needs (?U) to absorb the space
    "stx\x02cell",
    "  collapse   lots\n of \t whitespace  ",
    "mixed — ﬁ nal…  case\x02!",
    "",
]

QUALITY_CASES = [
    "normal sentence here",
    "bad � replacement",
    "GLYPH<1f> GLYPH<2a>",
    "/G12/G34 garbage",
    "/word /more trailing",
    "a/b.c/d.e x/f.g/h.i y/j.k/l.m fragmented",
]


@pytest.fixture(scope="module")
def sql_norm(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(DIRT_CASES)],
                               "i int, t string")
    out = df.select("i", normalize_plain_col(F.col("t")).alias("n")).collect()
    return {r["i"]: r["n"] for r in out}


def test_normalize_parity(spark, sql_norm):
    for i, t in enumerate(DIRT_CASES):
        assert sql_norm[i] == textnorm.normalize_plain(t), repr(t)


def test_quality_parity(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(QUALITY_CASES)],
                               "i int, t string")
    out = {r["i"]: r["q"] for r in df.select(
        "i", rate_text_quality_col(F.col("t")).alias("q")).collect()}
    for i, t in enumerate(QUALITY_CASES):
        assert abs(out[i] - textnorm.rate_text_quality(t)) < 1e-9, repr(t)


def test_corpus_payload_parity(spark):
    from docling_spark.sources.transcripts import _h, _plain_payload

    cases = [_plain_payload(_h(i, 3)) for i in range(200)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)],
                               "i int, t string")
    out = {r["i"]: r["n"] for r in df.select(
        "i", normalize_plain_col(F.col("t")).alias("n")).collect()}
    for i, t in enumerate(cases):
        assert out[i] == textnorm.normalize_plain(t)
