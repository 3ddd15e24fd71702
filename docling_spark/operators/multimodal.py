"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The decode/feature-extraction kernels are STUBBED (no image/audio libs in
this container — see ``decode_image``); everything Spark-side is real and
tested: schema, batch shape, partitioning, and the mapInPandas plumbing that
a real decoder would drop into. Mirrors the reference's ASR/frame-sampling
surface (docling/pipeline/asr_pipeline.py, docling/utils/
video_frame_sampling.py) as API shape only (SURVEY.md §2.a: out of scope
for model inference).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real container-header parse when the payload is a recognized image
    format (PNG/JPEG/GIF/BMP/WEBP/TIFF/ICO — ``engine.imagex``, a pure
    Python re-expression of the reference's PIL size probe,
    image_backend.py:117-119); *pixel* decoding still needs PIL/libvips
    and falls back to a deterministic sha256-derived fake for synthetic
    payloads so the downstream plumbing (schema, batching, joins) stays
    exercised with stable cross-engine-reproducible values."""
    from docling_spark.engine import imagex

    if payload and imagex.sniff_image(bytes(payload)) is not None:
        pages = imagex.image_pages(bytes(payload))
        return pages[0]
    h = hashlib.sha256(payload or b"").digest()
    return 64 + h[0] % 1920, 64 + h[1] % 1080


def feature_stub(payload: bytes, dim: int = 8) -> list[float]:
    """STUB embedding: hash-derived unit-free floats, deterministic."""
    h = hashlib.sha256(payload or b"").digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def extract_media_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads — the real
    Spark plumbing a production decoder plugs into (mapInPandas, bounded
    batch memory via maxRecordsPerBatch, no driver collect)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"].tolist(),
                "kind": pdf["kind"].tolist(),
                "n_bytes": [], "digest": [], "width": [], "height": [],
                "feature": [],
            }
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload) if payload is not None else b""
                out["n_bytes"].append(len(b))
                out["digest"].append(hashlib.sha256(b).hexdigest())
                if kind == "image":
                    w, h = decode_image(b)
                else:
                    w, h = None, None
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feature_stub(b, feature_dim))
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bits", T.IntegerType(), True),
    ]
)


def probe_media_meta(media: DataFrame) -> DataFrame:
    """REAL (not stubbed) audio/video container probe over binary payloads:
    ``engine.audiox`` parses WAV/FLAC/OGG/MP3/ADTS/MP4/MOV/AVI headers in
    pure Python — duration, sample rate, channels, bit depth — the
    deterministic half of the reference's ASR front-end (the part it
    delegates to ffmpeg, asr_transcriber.py); transcription itself stays
    out of scope. Same mapInPandas shape as ``extract_media_features``:
    Arrow-batched, no driver collect, scalar output columns only."""
    from docling_spark.engine.audiox import probe_media

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                m = probe_media(b)
                rows.append(
                    (
                        mid, kind, len(b), m["container"], m["codec"],
                        None if m["duration_s"] is None
                        else round(m["duration_s"], 6),
                        m["sample_rate"], m["channels"], m["bits"],
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PROBE_SCHEMA.fields]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=PROBE_SCHEMA
    )


def synth_wav_df(media_ids: DataFrame) -> DataFrame:
    """Deterministic PCM WAV payloads derived from ``media_id`` — real
    RIFF bytes through the real parser, parameters pure arithmetic so a
    SQL oracle can predict every probed field:

    sample_rate = [8000, 16000, 22050, 44100][media_id % 4]
    channels    = media_id % 2 + 1
    n_frames    = (rate // 100) * (media_id % 5 + 1)
    duration_s  = n_frames / rate  (≈ hundredths of a second; not exactly
                  — 22050 // 100 truncates, and the oracle mirrors that)
    """
    import struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rates = (8000, 16000, 22050, 44100)
        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                rate = rates[mid % 4]
                ch = mid % 2 + 1
                n = rate // 100 * (mid % 5 + 1)
                data = n * ch * 2
                hdr = (
                    b"RIFF" + struct.pack("<I", 36 + data) + b"WAVE"
                    + b"fmt " + struct.pack(
                        "<IHHIIHH", 16, 1, ch, rate, rate * ch * 2, ch * 2, 16
                    )
                    + b"data" + struct.pack("<I", data)
                )
                out.append((mid, "audio", hdr + b"\x00" * data))
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload"])

    return media_ids.select("media_id").mapInPandas(
        run,
        schema="media_id long, kind string, payload binary",
    )


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (binary payloads derived from ids)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (1 + i % 7)
        rows.append(
            (i, kinds[i % 3], bytearray(payload), f"application/x-{kinds[i % 3]}",
             {"src": f"synthetic://{i}"})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Image resize *plan*: target dimensions computed JVM-side from the
    decoded (width, height) — aspect-preserving, longest side clamped to
    ``max_side``, never upscaled. The pixel work is the decoder's
    (stubbed here); this is the column math a real resizer consumes.
    Input: features table (media_id, kind, width, height)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side))
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return (
        media.filter(F.col("kind") == "image")
        .select(
            "media_id", "width", "height",
            F.greatest(F.floor(F.col("width") * scale).cast("int"), F.lit(1))
            .alias("target_w"),
            F.greatest(F.floor(F.col("height") * scale).cast("int"), F.lit(1))
            .alias("target_h"),
        )
    )


def frame_sample_plan(media: DataFrame, fps: float = 0.5,
                      duration_key: str = "duration_s") -> DataFrame:
    """Video frame-sampling *plan* (docling video_frame_sampling analog):
    pure column math producing (media_id, frame_ts) rows to feed a decoder —
    the explode is JVM-side; no decode happens here."""
    dur = F.coalesce(
        # try_cast: a malformed duration string ('n/a') degrades to the
        # default instead of an ANSI CAST_INVALID_INPUT killing the job
        F.element_at(F.col("meta"), duration_key).try_cast("double"),
        F.lit(10.0),
    )
    n_frames = F.greatest((dur * F.lit(fps)).cast("int"), F.lit(1))
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: F.round(i / F.lit(fps), 3),
                )
            ).alias("frame_ts"),
        )
    )
