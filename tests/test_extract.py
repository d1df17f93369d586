"""Extract stage: planted-quad recovery + content-sha invariant."""

from __future__ import annotations

import pyspark.sql.functions as F

from kg_curation_spark import synth
from kg_curation_spark.stages.extract import extract_triples


def test_planted_quads_recovered_exactly(spark):
    quads = synth.load_reference_quads(spark)
    corpus = synth.render_corpus(quads).cache()
    got = extract_triples(corpus).cache()

    planted = quads.select("subject", "predicate", "literal").distinct()
    assert planted.exceptAll(got.select("subject", "predicate", "literal")).count() == 0
    assert got.select("subject", "predicate", "literal").exceptAll(planted).count() == 0


def test_content_sha_invariant(spark):
    """Every emitted triple's content_sha equals sha256 of its source file's
    content (the input_hint per-row invariant, carried end-to-end)."""
    quads = synth.synthetic_quads(spark, 200)
    corpus = synth.render_corpus(quads).cache()
    got = extract_triples(corpus)

    src = corpus.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("expect_sha")
    )
    joined = got.join(src, ["repo", "path", "commit"], "left")
    assert joined.filter(F.col("expect_sha").isNull()).count() == 0
    assert joined.filter(F.col("content_sha") != F.col("expect_sha")).count() == 0


def test_synthetic_quads_deterministic(spark):
    a = synth.synthetic_quads(spark, 100).collect()
    b = synth.synthetic_quads(spark, 100).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
