"""Incremental extraction: exactly-once drain of new files, parity with batch."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from kg_curation_spark import synth
from kg_curation_spark.stages.extract import extract_triples_raw
from kg_curation_spark.streaming.incremental import incremental_extract


def test_available_now_drains_and_is_exactly_once(spark, tmp_path):
    repos_dir = str(tmp_path / "repos")
    out_dir = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")

    quads1 = synth.synthetic_quads(spark, 100, seed=1)
    synth.render_corpus(quads1).coalesce(2).write.mode("append").parquet(repos_dir)

    incremental_extract(spark, repos_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    batch1 = extract_triples_raw(spark.read.parquet(repos_dir)).count()
    assert n1 == batch1 > 0

    # re-run with no new files: nothing re-emitted (exactly-once)
    incremental_extract(spark, repos_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n1

    # new files land -> only the delta is processed
    quads2 = synth.synthetic_quads(spark, 50, seed=2)
    synth.render_corpus(quads2).coalesce(1).write.mode("append").parquet(repos_dir)
    incremental_extract(spark, repos_dir, out_dir, ckpt)
    n2 = spark.read.parquet(out_dir).count()
    assert n2 > n1
    # parity with a full batch run over everything
    full = extract_triples_raw(spark.read.parquet(repos_dir))
    got = spark.read.parquet(out_dir)
    assert (
        full.select("subject", "predicate", "literal").exceptAll(
            got.select("subject", "predicate", "literal")
        ).count()
        == 0
    )


def test_stateful_first_seen_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState: duplicates are suppressed across micro-batches
    AND across separate stream invocations (state survives in the
    checkpoint), matching the batch exact_dedup contract incrementally."""
    from kg_curation_spark.streaming.stateful import streaming_dedup_first_seen

    src = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def drain():
        docs = (
            spark.readStream.schema("doc_id string, text string")
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )
        q = (
            streaming_dedup_first_seen(docs)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(
        [("d1", "alpha"), ("d2", "beta"), ("d3", "alpha")],  # d3 dup-in-batch
        "doc_id string, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    first = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert ("d1" in first) != ("d3" in first)  # exactly one alpha emitted
    assert "d2" in first and len(first) == 2

    # second invocation: new file with one dup of batch 1 + one new doc
    spark.createDataFrame(
        [("d4", "alpha"), ("d5", "gamma")], "doc_id string, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    after = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert "d4" not in after  # suppressed by state from the previous run
    assert "d5" in after and len(after) == 3
