"""Custom stateful streaming operator: first-seen dedup across micro-batches.

A training-data ingest pipeline must dedup NEW documents against everything
already ingested — state that outlives any single micro-batch. This is the
``applyInPandasWithState`` form of the batch exact-dedup operator
(operators/dedup.py): group by a hash bucket of the content hash, keep the
set of seen hashes as group state, emit only first occurrences.

Scale design: the state key is a BUCKET (hash prefix), not the raw content
hash, so state rows stay bounded at `buckets` groups and each group's set
grows with unique content only; on a real cluster the RocksDB state store
spills them. Buckets distribute uniformly (xxhash64), so no hot state key.
The reference has no streaming surface (SURVEY.md §2.9) — this extends its
dedup semantics to the incremental-ingest path alongside
streaming/incremental.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("content_hash", StringType()),
    ]
)
STATE_SCHEMA = StructType([StructField("seen", ArrayType(StringType()))])


def streaming_dedup_first_seen(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
) -> DataFrame:
    """streaming docs -> first-seen (doc_id, content_hash) rows; duplicates
    of anything seen in ANY earlier micro-batch (or earlier in the same
    batch) are suppressed. Exactly the batch exact_dedup contract, kept
    incrementally."""
    hashed = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("content_hash"),
    ).withColumn(
        "bucket",
        (F.abs(F.xxhash64("content_hash")) % buckets).cast(IntegerType()),
    )

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: set = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh = pdf[
                ~pdf["content_hash"].isin(seen)
                & ~pdf["content_hash"].duplicated(keep="first")
            ]
            seen.update(fresh["content_hash"].tolist())
            yield fresh[["doc_id", "content_hash"]]
        state.update((sorted(seen),))

    return hashed.groupBy("bucket").applyInPandasWithState(
        dedup,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
