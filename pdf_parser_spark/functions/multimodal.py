"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Two decode paths through the SAME dataflow:

- **real** (default): stdlib decoders for the formats this container can
  parse — PNG header decode (width/height from the IHDR chunk via
  ``struct``) and WAV decode (sample rate / frame count → duration via
  ``wave``).  Payloads in any other format yield a structured
  ``decode_status='unsupported_format'`` row (the quarantine-column
  philosophy — never a task failure).  Heavier codecs (JPEG, video,
  resampling) plug into the same branch with PIL/ffmpeg when available.
- **fake=True**: deterministic digest-derived feature vector, for
  plumbing tests that need a stable ``feature`` column without any
  format assumptions.

The media span model follows the reference's image records
(extractor.py:260-291: name/bbox/width/height identity) lifted to binary
payloads keyed by ``media_ref``.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), nullable=False),
        StructField("media_type", StringType()),   # image|audio|video
        StructField("payload", BinaryType()),      # opaque encoded bytes
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),       # PNG decode
        StructField("height", IntegerType()),      # PNG decode
        StructField("duration_ms", LongType()),    # WAV decode
        StructField("feature", ArrayType(DoubleType())),  # fixed dim 8
        StructField("decode_status", StringType()),
    ]
)

_FEATURE_DIM = 8

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _fake_feature(payload: bytes) -> list:
    """Deterministic stand-in for a learned embedding: 8 doubles derived
    from the payload digest (stable across runs/partitions)."""
    digest = hashlib.md5(payload or b"").digest()
    return [digest[i] / 255.0 for i in range(_FEATURE_DIM)]


def decode_png_dims(payload: bytes):
    """(width, height) from a PNG's IHDR chunk, or None if not a PNG.

    PNG layout (public spec): 8-byte signature, then the IHDR chunk —
    4-byte length, 4-byte type ``IHDR``, then big-endian u32 width and
    u32 height."""
    if (
        payload is None
        or len(payload) < 24
        or not payload.startswith(PNG_MAGIC)
        or payload[12:16] != b"IHDR"
    ):
        return None
    return struct.unpack(">II", payload[16:24])


def decode_wav_duration_ms(payload: bytes):
    """Duration in ms from a RIFF/WAVE payload, or None on parse failure."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF":
        return None
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            if rate <= 0:
                return None
            return (w.getnframes() * 1000) // rate
    except wave.Error:
        return None


def _decode_one(payload) -> dict:
    """Real per-item decode (runs inside the Arrow batch loop)."""
    b = bytes(payload or b"")
    dims = decode_png_dims(b)
    if dims is not None:
        return {
            "width": dims[0],
            "height": dims[1],
            "duration_ms": None,
            "decode_status": "ok",
        }
    ms = decode_wav_duration_ms(b)
    if ms is not None:
        return {
            "width": None,
            "height": None,
            "duration_ms": ms,
            "decode_status": "ok",
        }
    return {
        "width": None,
        "height": None,
        "duration_ms": None,
        "decode_status": "unsupported_format",
    }


def decode_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas over media rows → per-item feature/metadata rows.

    One Arrow batch at a time — never the whole partition in memory.
    The real path (default) decodes PNG dimensions and WAV durations
    with the stdlib; other formats come back as structured
    ``unsupported_format`` rows.  ``fake=True`` swaps the decoder for
    the deterministic digest feature (identical dataflow)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes = pdf["payload"].map(
                lambda p: len(p) if p is not None else 0
            )
            if fake:
                yield pd.DataFrame(
                    {
                        "media_ref": pdf["media_ref"],
                        "media_type": pdf["media_type"],
                        "n_bytes": n_bytes,
                        "width": pd.Series(
                            [None] * len(pdf), dtype="object"
                        ),
                        "height": pd.Series(
                            [None] * len(pdf), dtype="object"
                        ),
                        "duration_ms": pd.Series(
                            [None] * len(pdf), dtype="object"
                        ),
                        "feature": pdf["payload"].map(
                            lambda p: _fake_feature(bytes(p or b""))
                        ),
                        "decode_status": "ok",
                    }
                )
                continue
            decoded = pd.DataFrame(
                [_decode_one(p) for p in pdf["payload"]],
                index=pdf.index,
            )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "width": decoded["width"],
                    "height": decoded["height"],
                    "duration_ms": decoded["duration_ms"],
                    # a learned feature needs a vision/audio model — out
                    # of scope for the stdlib decoders
                    "feature": pd.Series([None] * len(pdf), dtype="object"),
                    "decode_status": decoded["decode_status"],
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def link_media(
    spans_out: DataFrame,
    media: DataFrame,
    broadcast: bool | None = None,
) -> DataFrame:
    """Media-reference linking (north rule): join image/figure spans to
    their payload metadata on ``media_ref``.

    Join strategy is gated, not hard-wired: at 100 TB the distinct-asset
    dimension is NOT broadcastable, so by default (``broadcast=None``) no
    hint is planted and AQE sizes the join at runtime (broadcast when the
    dim is under the threshold, sort-merge + skew-split otherwise — hot
    media_refs are the documented skew case).  Pass ``broadcast=True``
    only when the caller KNOWS the dim is bounded (e.g. a per-tenant
    asset catalog)."""
    media_dim = media.select("media_ref", "media_type", "width", "height")
    if broadcast:
        media_dim = F.broadcast(media_dim)
    image_spans = spans_out.filter(F.col("kind").isin("image", "figure"))
    return image_spans.join(media_dim, "media_ref", "left")


def synthesize_media(spark, docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from span media_refs (fixtures
    carry no real payloads): payload bytes = utf-8 of the ref string."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind").isin("image", "figure"))
        .select(
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("dims"),
        )
        .filter(F.col("media_ref").isNotNull())
        .distinct()
    )
    return refs.select(
        "media_ref",
        F.lit("image").alias("media_type"),
        F.encode(F.concat(F.lit("payload:"), F.col("media_ref")), "utf-8")
        .alias("payload"),
        F.coalesce(
            F.split(F.col("dims"), "x")[0].cast("int"), F.lit(0)
        ).alias("width"),
        F.coalesce(
            F.split(F.col("dims"), "x")[1].cast("int"), F.lit(0)
        ).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def synthesize_png_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-format media table: one minimal PNG payload per
    distinct image media_ref, dimensions derived from the ref string.

    Built entirely with native expressions — the PNG signature + IHDR
    prefix is assembled as hex and ``unhex``-ed into binary (big-endian
    u32 width/height = zero-padded 8-hex-char fields), so the fixture
    generator itself stays JVM-side.  The payload is a header-only PNG
    (no IDAT) — exactly what a header decoder needs, invalid for a pixel
    decoder, which is fine: ``decode_png_dims`` reads only the IHDR."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind").isin("image", "figure"))
        .select(F.col("s.media_ref").alias("media_ref"))
        .filter(F.col("media_ref").isNotNull())
        .distinct()
    )
    # deterministic dims from the ref string: 16..271 via md5 bytes
    h = F.md5(F.col("media_ref"))
    width = (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") + 16)
    height = (F.conv(F.substring(h, 3, 2), 16, 10).cast("int") + 16)
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),        # signature
        F.lit("0000000D49484452"),        # IHDR length=13 + type
        F.lpad(F.hex(width), 8, "0"),     # big-endian u32 width
        F.lpad(F.hex(height), 8, "0"),    # big-endian u32 height
        F.lit("0806000000"),              # bit depth 8, RGBA, no interlace
        F.lit("00000000"),                # CRC (unchecked by header decode)
    )
    return refs.select(
        "media_ref",
        F.lit("image").alias("media_type"),
        F.unhex(png_hex).alias("payload"),
        width.alias("width"),
        height.alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
