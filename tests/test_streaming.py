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
