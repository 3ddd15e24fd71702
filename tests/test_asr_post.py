"""ASR segment post-processing (asr_post.py vs
asr_transcriber.py:44-177)."""

from __future__ import annotations

from docling_spark.operators.asr_post import asr_segments_post, audio_mimetype
from pyspark.sql import functions as F


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id int, start_time double, end_time double, "
              "speaker string, speaker_id int, text string")


def test_zero_duration_repaired_with_epsilon(spark):
    out = asr_segments_post(_segs(spark, [
        (1, 2.5, 2.5, None, None, "hi"),
        (1, 4.0, 3.0, None, None, "backwards"),
    ])).collect()
    ends = {r["text"]: r["end_time"] for r in out}
    assert ends["hi"] == 2.5 + 0.001
    assert ends["backwards"] == 4.0 + 0.001  # end <= start, not just ==


def test_invalid_segments_dropped(spark):
    out = asr_segments_post(_segs(spark, [
        (1, None, 2.0, None, None, "no start"),
        (1, 1.0, None, None, None, "no end"),
        (1, 1.0, 2.0, None, None, "   "),
        (1, 3.0, 4.0, None, None, "kept"),
    ])).collect()
    assert [r["text"] for r in out] == ["kept"]


def test_zero_duration_with_blank_text_not_repaired_then_dropped(spark):
    # the epsilon repair is gated on non-empty text (:90-96); a blank
    # zero-duration segment keeps end<=start and is dropped by the text
    # filter anyway
    out = asr_segments_post(_segs(spark, [(1, 2.0, 2.0, None, None, " ")]))
    assert out.count() == 0


def test_speaker_default_and_rank_and_line(spark):
    out = {r["seg_rank"]: r for r in asr_segments_post(_segs(spark, [
        (1, 5.0, 7.25, None, None, "later"),
        (1, 0.0, 2.5, None, 3, "first"),
    ])).collect()}
    assert out[0]["speaker"] == "speaker-3"
    assert out[0]["line"] == "[time: 0.0-2.5] [speaker:speaker-3] first"
    assert out[1]["speaker"] is None
    assert out[1]["line"] == "[time: 5.0-7.25] later"


def test_explicit_speaker_wins_over_id(spark):
    out = asr_segments_post(
        _segs(spark, [(1, 0.0, 1.0, "alice", 7, "x")])).collect()[0]
    assert out["speaker"] == "alice"


def test_audio_mimetype_map(spark):
    df = spark.createDataFrame(
        [("a.WAV",), ("b.mp3",), ("c.flac",), ("d.xyz",), ("noext",)],
        "fn string")
    got = [r[0] for r in df.select(audio_mimetype(F.col("fn"))).collect()]
    assert got == ["audio/x-wav", "audio/mp3", "audio/flac",
                   "audio/x-wav", "audio/x-wav"]
