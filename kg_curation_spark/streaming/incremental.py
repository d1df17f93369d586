"""Incremental triple extraction over new repo partitions.

The reference has no streaming surface (SURVEY.md §2.9) — its only
incremental behavior is memo-resume + append-mode outputs. The scale
equivalent for "new repos land daily" is a file-source Structured Stream
with ``Trigger.AvailableNow``: each invocation drains exactly the files not
yet in the checkpoint, runs the SAME extract transformation as batch
(stages/extract.py — one code path for both), appends to the triple sink,
and stops. Exactly-once across repeated invocations comes from the stream
checkpoint, mirroring the batch pipeline's commit markers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from ..stages.extract import extract_triples_raw

REPOS_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def incremental_extract(
    spark: SparkSession,
    repos_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all unprocessed parquet files under repos_dir -> append
    extracted triples to out_dir. Blocking; returns when drained."""
    reader = (
        spark.readStream.schema(REPOS_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(repos_dir)

    triples = extract_triples_raw(stream)

    query = (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
