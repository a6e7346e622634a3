"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container): by
default it raises ``NotImplementedError`` naming the real implementation
point; with ``fake=True`` it produces a deterministic fake feature vector
so the Spark-side plumbing — schema, batch shape, partition behavior — is
real and testable end-to-end.

The media span model follows the reference's image records
(extractor.py:260-291: name/bbox/width/height identity) lifted to binary
payloads keyed by ``media_ref``.
"""

from __future__ import annotations

import hashlib
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
        StructField("feature", ArrayType(DoubleType())),  # fixed dim 8
        StructField("decode_status", StringType()),
    ]
)

_FEATURE_DIM = 8


def _fake_feature(payload: bytes) -> list:
    """Deterministic stand-in for a real decoder: 8 doubles derived from
    the payload digest (stable across runs/partitions)."""
    digest = hashlib.md5(payload or b"").digest()
    return [digest[i] / 255.0 for i in range(_FEATURE_DIM)]


def decode_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas over media rows → per-item feature rows.

    The real implementation decodes ``payload`` with an image/audio
    library inside the iterator (one Arrow batch at a time, never the
    whole partition in memory).  ``fake=True`` exercises the identical
    dataflow with the deterministic stand-in.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode requires an image/audio library "
                    "(PIL/torchaudio/ffmpeg) not present in this "
                    "environment; pass fake=True for the deterministic "
                    "plumbing test"
                )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_feature(bytes(p or b""))
                    ),
                    "decode_status": "ok",
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
