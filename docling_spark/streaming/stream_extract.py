"""Structured Streaming wrapper over the extraction operator.

The reference has no streaming runtime (SURVEY.md §2.i); its nearest analog
is the bounded-queue threaded pipeline (standard_pdf_pipeline.py:155-311)
with catch-up batch polling. Here the same extraction operator lifts to
Structured Streaming unchanged because it is stateless per row:
``readStream → extract_turns → writeStream`` with event-time watermarking
on ``ts`` for the windowed metrics aggregation (late turns tolerated up to
the watermark; WebVTT cue timings, webvtt_backend.py:164-178, are the
reference's event-time analog).

Checkpointing: Spark's streaming checkpoint replaces the batch job's state
table — exactly-once sink semantics per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_spark.operators.extract_ops import extract_turns
from docling_spark.schema import TRANSCRIPTS_SCHEMA


def read_transcript_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream of transcript parquet drops (an Iceberg streaming
    read swaps in behind the same schema)."""
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def stream_extract(
    transcripts: DataFrame,
    pdf_passwords: tuple[str, ...] = (),
    allowed_formats: tuple[str, ...] | None = None,
) -> DataFrame:
    """The streaming plan: identical operator, streaming semantics free."""
    return extract_turns(transcripts, pdf_passwords=pdf_passwords,
                         allowed_formats=allowed_formats)


def stream_metrics(
    transcripts: DataFrame, watermark: str = "1 hour",
    window: str = "5 minutes",
    pdf_passwords: tuple[str, ...] = (),
    allowed_formats: tuple[str, ...] | None = None,
) -> DataFrame:
    """Windowed extraction metrics with late-data handling: per (window,
    status) counts under a 1-hour watermark (north-rule sidecar, streaming
    flavor).

    The watermark is applied AFTER extract_turns: mapInPandas discards
    the event-time watermark of its input (applying it before left the
    window aggregation unwatermarked — append mode rejected the plan,
    update mode never evicted state or dropped late rows). ``ts`` passes
    through extraction unchanged, so watermarking the extracted frame is
    semantically identical."""
    # same extraction POLICY as the data path: a metrics stream running
    # a different password/format-policy set than run_stream would
    # misreport the pipeline it monitors
    ext = extract_turns(
        transcripts, pdf_passwords=pdf_passwords,
        allowed_formats=allowed_formats,
    ).withWatermark("ts", watermark)
    return (
        ext.groupBy(F.window("ts", window), "status")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "status", "n",
        )
    )


def run_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    pdf_passwords: tuple[str, ...] = (),
    allowed_formats: tuple[str, ...] | None = None,
):
    """Launch the extraction stream (availableNow=True → catch-up batch
    semantics, the reference's batch-polling analog)."""
    src = read_transcript_stream(spark, input_path)
    out = stream_extract(src, pdf_passwords=pdf_passwords,
                         allowed_formats=allowed_formats)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def join_streams_within(
    turns: DataFrame,
    annotations: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    turn_ts: str = "ts",
    ann_ts: str = "ann_ts",
    tolerance: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each turn with the
    annotations that arrive for it within ``tolerance`` of the turn's
    event time (same key columns).

    Both sides carry a watermark and the join condition bounds the
    event-time distance, so Spark can evict join state instead of
    buffering either stream forever — the two requirements for an
    unbounded-stream join to run with bounded memory. State per key lives
    for watermark + tolerance, independent of stream length. Works
    identically on batch frames (the time bound becomes a plain filter).
    """
    t = turns.withWatermark(turn_ts, watermark)
    a = annotations.withWatermark(ann_ts, watermark)
    cond = None
    for k in keys:
        c = t[k] == a[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (a[ann_ts] >= t[turn_ts])
        & (a[ann_ts] <= t[turn_ts] + F.expr(f"INTERVAL {tolerance}"))
    )
    out = t.join(a, cond, "inner")
    for k in keys:
        out = out.drop(a[k])
    return out
