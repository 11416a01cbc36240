"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The Spark-side contract is fully real — schemas, partitioning, UDF
signatures, batch shapes are what a production pipeline would use at
100 TB (binary columns stream through Arrow in bounded batches;
decode is a narrow map, no shuffle). The actual pixel/sample decode
is STUBBED: the image/audio libraries are not in this container, so
``decode_*`` raise NotImplementedError unless the lib imports, and
``fake_features`` provides a deterministic stand-in used by tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # decode libs are absent in this environment; gate them
    from PIL import Image  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_TYPES = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents corpus:
    payload = utf-8 bytes of the text, metadata derived from
    n_chars. Exercises the binary + struct column plumbing."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(m) for m in MEDIA_TYPES]),
                     (F.col("doc_id") % 3 + 1).cast("int"))
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"))


def extract_features(media: DataFrame,
                     batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real decode is stubbed (no PIL/librosa in the container): features
    are a deterministic 8-dim digest of the payload bytes, which keeps
    the batch shape, schema, and Arrow transfer identical to a real
    extractor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf["payload"]],
                "features": feats,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def fake_features(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-feature vector."""
    if not payload:
        return [0.0] * dim
    import hashlib
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def decode_image(payload: bytes):
    """Decode an image payload. STUB: PIL is not available here."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; not present in this container")
    import io
    return Image.open(io.BytesIO(payload))


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Distributed image resize via mapInPandas. STUB decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not HAVE_PIL:
                raise NotImplementedError(
                    "resize requires PIL; not present in this container")
            yield pdf  # pragma: no cover — real impl decodes+resizes

    return media.mapInPandas(run, schema=media.schema)


def frame_sample(media: DataFrame, every_ms: int) -> DataFrame:
    """Frame sampling plan for video payloads: one output row per
    sampled frame timestamp. Timestamps come from metadata (JVM-side
    sequence explode); frame pixel extraction itself is the stubbed
    decode step."""
    frames = media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(F.sequence(
            F.lit(0),
            F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
            F.lit(every_ms))).alias("frame_ms"))
    return frames
