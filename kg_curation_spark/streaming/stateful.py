"""Custom stateful streaming operator: first-seen dedup across micro-batches.

A training-data ingest pipeline must dedup NEW documents against everything
already ingested — state that outlives any single micro-batch. This is the
``applyInPandasWithState`` form of the batch exact-dedup operator
(operators/dedup.py): group by the content hash, keep a one-row "seen"
flag as group state, emit only first occurrences.

Scale design: state is keyed by the CONTENT HASH itself, so each group's
state is a single flag row and a micro-batch only reads/writes state for
the hashes present in that batch — per-batch state I/O is O(batch), not
O(total unique hashes ever seen). (An earlier bucket-keyed form kept one
ever-growing sorted array per bucket and rewrote it wholesale every batch —
ingest cost degraded linearly over the stream's lifetime.) Total state rows
equal total unique content, exactly like Spark's own streaming
dropDuplicates; on a real cluster the RocksDB state store spills them, and
sha256 keys distribute uniformly — no hot state key.

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
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("content_hash", StringType()),
    ]
)
STATE_SCHEMA = StructType([StructField("seen", IntegerType())])


def streaming_dedup_first_seen(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """streaming docs -> first-seen (doc_id, content_hash) rows; duplicates
    of anything seen in ANY earlier micro-batch (or earlier in the same
    batch) are suppressed. Exactly the batch exact_dedup contract, kept
    incrementally."""
    hashed = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("content_hash"),
    )

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if not state.exists:
            # deterministic keeper = min doc_id of the batch that introduced
            # the hash. A group larger than the Arrow batch size arrives as
            # MULTIPLE chunks, so the min must be tracked across the whole
            # iterator — head(1) of the first chunk would be chunk-order-
            # dependent.
            best: pd.DataFrame | None = None
            for pdf in pdfs:
                if len(pdf):
                    cand = pdf.sort_values("doc_id").head(1)
                    if best is None or cand["doc_id"].iloc[0] < best["doc_id"].iloc[0]:
                        best = cand
            if best is not None:
                yield best[["doc_id", "content_hash"]]
                state.update((1,))
        # already seen: drain the iterator without emitting

    return hashed.groupBy("content_hash").applyInPandasWithState(
        dedup,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
