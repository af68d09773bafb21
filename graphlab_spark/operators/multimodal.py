"""Multimodal columns: opaque binary media + typed metadata, decoded by
``mapInPandas`` batch UDFs.

The image/audio libraries are not available in this container, so the
DECODE step is stubbed: ``decode_media_batch`` computes deterministic
fake metadata from the payload bytes, and the real decoder hook raises
``NotImplementedError``. Everything Spark-side is real and tested: the
binary column schema, the batch iterator shape, partition sizing, and
the explode of per-frame samples.

At 100 TB media payloads dominate I/O: the media column lives in its own
parquet column chunk (columnar pruning skips it unless selected), and
``spark.sql.files.maxPartitionBytes`` should be raised so tasks amortize
decode setup per batch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministic binary payload per doc (stand-in for image/audio bytes).

    payload = utf-8 of md5(doc_id) repeated (doc_id % 7 + 1) times;
    media_type cycles image/audio/video by doc_id % 3. Pure column ops —
    replicable in SQL for oracle checks.
    """
    return docs.select(
        "doc_id",
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode(
            F.repeat(F.md5(F.col("doc_id").cast("string")), (F.col("doc_id") % 7 + 1).cast("int")),
            "UTF-8",
        ).alias("media"),
    )


def real_decode(media: bytes, media_type: str):  # pragma: no cover - by design
    """Hook for a real decoder (PIL / torchaudio / pyav). Not available in
    this environment; the pipeline uses the deterministic stub instead."""
    raise NotImplementedError("media decoding libraries are not installed in this container")


def decode_media(media_df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """(doc_id, media_type, media binary) → typed metadata via mapInPandas.

    Stub semantics (deterministic, tested): width = 64 + (n_bytes mod 192),
    height = 64 + (n_bytes mod 128), n_frames = 1 for image else
    1 + (n_bytes mod 24).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if use_real_decoder:
                b.apply(lambda r: real_decode(r["media"], r["media_type"]), axis=1)
            n_bytes = b["media"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "media_type": b["media_type"],
                    "n_bytes": n_bytes,
                    "width": (64 + n_bytes % 192).astype("int32"),
                    "height": (64 + n_bytes % 128).astype("int32"),
                    "n_frames": (
                        (b["media_type"] == "image").map({True: 0, False: 1})
                        * (1 + n_bytes % 24)
                        + (b["media_type"] == "image").astype(int)
                    ).astype("int32"),
                }
            )

    return media_df.mapInPandas(decode, MEDIA_META_SCHEMA)


def resize_plan(meta_df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Aspect-preserving resize plumbing: target dims + scale as pure
    column math (JVM-side, SQL-mirrorable). The actual pixel resample
    belongs inside the same ``mapInPandas`` batch as the decode and is
    stubbed for the same reason (``real_decode``): no image libs here —
    the SHAPE of the computation (scale policy, rounding, min-1 clamp)
    is the contract this pins.
    """
    scale = F.least(
        F.lit(float(target_w)) / F.col("width"), F.lit(float(target_h)) / F.col("height")
    )
    return meta_df.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("out_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("out_h"),
        F.round(scale, 6).alias("scale"),
    )


FEATURE_DIM = 8


def extract_features(media_df: DataFrame) -> DataFrame:
    """(doc_id, media_type, media) → (doc_id, features array<float>) via
    ``mapInPandas`` — the feature-extraction plumbing (batch iterator,
    Arrow schema, vectorized numpy) is real; the embedding itself is a
    deterministic stub of the payload size (a real model hook would sit
    exactly where the numpy expression is, cf. ``real_decode``)."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = b["media"].map(len).to_numpy(dtype=np.int64)
            M = ((n[:, None] * (np.arange(FEATURE_DIM)[None, :] + 1)) % 97) / 97.0
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "features": [row.astype(np.float32).tolist() for row in M],
                }
            )

    return media_df.mapInPandas(feats, schema)


def frame_sample(meta_df: DataFrame, every: int = 4) -> DataFrame:
    """Explode per-frame sample rows (frame_no 0, every, 2·every …) —
    the plumbing a video feature-extractor would fan out over."""
    return meta_df.select(
        "doc_id",
        "media_type",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every))
        ).alias("frame_no"),
    )
