"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so the
actual byte->pixels/samples decode is STUBBED: ``fake_decode=True`` derives
deterministic features from the bytes themselves (sha-seeded), and
``fake_decode=False`` raises NotImplementedError at the decode site. The
Spark-side plumbing — binary schema, metadata struct, partition-preserving
UDF signature, Arrow batch shape — is real and tested; swapping the stub
for a real decoder changes one function body on the executor side only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", StringType()),  # binary carried as... see asset_table
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 8


def asset_table(documents: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: text bytes stand in for
    encoded media payloads (binary column, typed metadata)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.concat(F.lit("m"), F.col("doc_id")).alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),  # binary
    )


def _decode_stub(payload: bytes, kind: str, fake_decode: bool) -> np.ndarray:
    if not fake_decode:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg — not available in this "
            "environment; pass fake_decode=True for the deterministic stub"
        )
    # deterministic fake "decode": feature = normalized byte histogram moments
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    return np.frombuffer(h[: FEATURE_DIM * 4], dtype="<u4").astype("float32") / 2**32


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Binary -> fixed-dim feature vector via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k, fake_decode)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )
