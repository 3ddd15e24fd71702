"""Structured Streaming wrapper: the same extraction operator under
readStream → writeStream with availableNow catch-up semantics and
checkpointed exactly-once progress (SURVEY.md §2.i)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_spark.sources.transcripts import transcripts_df
from docling_spark.streaming.stream_extract import run_stream


@pytest.mark.timeout(600)
def test_stream_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    tr = transcripts_df(spark, 12, partitions=3)
    tr.write.parquet(inp)
    n_in = spark.read.parquet(inp).count()

    q = run_stream(spark, inp, out, ckpt, available_now=True)
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    assert got.count() == n_in
    # same per-status counts as the batch operator on the same input
    from docling_spark.operators.extract_ops import extract_turns

    batch = {
        r["status"]: r["n"]
        for r in extract_turns(spark.read.parquet(inp))
        .groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    stream = {
        r["status"]: r["n"]
        for r in got.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    assert batch == stream

    # restart with the same checkpoint and no new files: no duplicates
    q2 = run_stream(spark, inp, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_in
