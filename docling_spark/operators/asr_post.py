"""ASR transcript segment post-processing — the deterministic tail of
the reference's whisper transcriber (docling/pipeline/asr_transcriber.py),
with the ASR model itself as the stubbed boundary (segments arrive as
rows). Pure JVM column expressions:

- zero-duration repair: a segment with ``end_time <= start_time`` but
  non-empty text gets ``end_time = start_time + 0.001``
  (ZERO_DURATION_SEGMENT_EPS, asr_transcriber.py:44-50, 90-102)
- validity filter: only segments with both timestamps and non-blank
  text become document items (:104-109)
- speaker default: a null speaker name with a numeric id becomes
  ``speaker-{id}`` (_ConversationItem.speaker, :148-151)
- start-time ordering rank (__lt__, :157-160) as a per-conversation
  window — bounded per conversation, never a global sort
- ``to_string`` rendering ``[time: S-E] [speaker:X] text`` (:167-177)
- audio mimetype-by-suffix map (_audio_mimetype, :59-71)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ZERO_DURATION_SEGMENT_EPS = 0.001  # asr_transcriber.py:44

# asr_transcriber.py:59-66
_MIMETYPES = {".wav": "audio/x-wav", ".mp3": "audio/mp3",
              ".m4a": "audio/m4a", ".aac": "audio/aac",
              ".ogg": "audio/ogg", ".flac": "audio/flac"}


def audio_mimetype(filename: Column) -> Column:
    """Suffix → mimetype with the reference's x-wav fallback
    (asr_transcriber.py:69-71)."""
    suffix = F.lower(F.regexp_extract(filename, r"(\.[A-Za-z0-9]+)$", 1))
    expr: Column = F.lit("audio/x-wav")
    for ext, mime in _MIMETYPES.items():
        expr = F.when(suffix == ext, mime).otherwise(expr)
    return expr


def asr_segments_post(
    df: DataFrame,
    conv_cols: tuple[str, ...] = ("doc_id",),
    start_col: str = "start_time",
    end_col: str = "end_time",
    speaker_col: str = "speaker",
    speaker_id_col: str = "speaker_id",
    text_col: str = "text",
) -> DataFrame:
    """Segments → validated, ordered conversation items with the
    rendered transcript line. Drops invalid rows, repairs zero-duration
    ones, fills default speaker names, ranks by start time within the
    conversation, and adds ``line`` (the to_string format)."""
    start = F.col(start_col).cast("double")
    end = F.col(end_col).cast("double")
    text = F.col(text_col)
    has_text = F.trim(text) != ""

    fixed_end = F.when(
        end.isNotNull() & start.isNotNull() & (end <= start) & has_text,
        start + ZERO_DURATION_SEGMENT_EPS,
    ).otherwise(end)

    speaker = F.coalesce(
        F.col(speaker_col),
        F.when(F.col(speaker_id_col).isNotNull(),
               F.concat(F.lit("speaker-"),
                        F.col(speaker_id_col).cast("string"))),
    )

    out = (
        df.withColumn(end_col, fixed_end)
        .filter(start.isNotNull() & F.col(end_col).isNotNull() & has_text)
        .withColumn(speaker_col, speaker)
    )
    # deterministic tiebreakers: equal start times (overlapping diarized
    # speech) must rank identically across runs/shuffles
    rank = F.row_number().over(
        Window.partitionBy(*conv_cols)
        .orderBy(start_col, end_col, text_col)) - 1
    line = F.concat(
        F.lit("[time: "), start.cast("string"), F.lit("-"),
        F.col(end_col).cast("string"), F.lit("] "),
        F.when(F.col(speaker_col).isNotNull(),
               F.concat(F.lit("[speaker:"), F.col(speaker_col),
                        F.lit("] "))).otherwise(""),
        text,
    )
    return out.withColumns({"seg_rank": rank, "line": line})
