"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. The actual codec step is STUBBED: the
sandbox ships no image/audio libraries, so ``decode_image_batch`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (dimensions derived from the payload's md5)
stands in — letting the distributed plumbing be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("byte_len", T.IntegerType(), False),
        T.StructField("checksum", T.StringType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        # double, not float32: the 6-decimal feature values are part of
        # the cross-engine spec and must round-trip exactly
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload column (UTF-8 bytes of the
    text stand in for encoded media) + its typed metadata struct. At
    scale the payload column lives in its own parquet column chunk and is
    pruned away by any query that only touches metadata."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.length(payload).cast("int").alias("byte_len"),
            F.md5(payload).alias("checksum"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    d = hashlib.md5(payload).digest()
    width = 16 + d[0] % 64
    height = 16 + d[1] % 64
    channels = 1 + d[2] % 3
    feature = [round(b / 255.0, 6) for b in d[:8]]
    return width, height, channels, feature


def decode_image_batch(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Decode payloads to (dims, feature vector) via ``mapInPandas``.

    Real decode is NOT implemented in this environment (no PIL/ffmpeg);
    ``fake=True`` routes to the deterministic stand-in. The Arrow batch
    shape (iterator of pandas DataFrames, one output row per input row)
    and the declared schema are exactly what a real decoder would use —
    swap ``_fake_decode`` for the codec and nothing else changes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/libjpeg; not available in "
                    "this environment — pass fake=True for the "
                    "deterministic stand-in"
                )
            rows = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "channels": [r[2] for r in rows],
                    "feature": [r[3] for r in rows],
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(df: DataFrame, n_frames_col: str = "n_frames", every: int = 10) -> DataFrame:
    """Frame-sampling plumbing: given per-row frame counts, emit the
    sampled frame indexes (0, every, 2·every, …) as an array column —
    the JVM-side skeleton a video pipeline hangs its decode UDF on.
    A row with no frames samples nothing (empty array, not [0])."""
    return df.withColumn(
        "sampled_frames",
        F.when(
            F.col(n_frames_col) <= 0, F.array().cast("array<int>")
        ).otherwise(
            F.sequence(
                F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every)
            ).cast("array<int>")
        ),
    )
