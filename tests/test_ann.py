"""Similarity search: brute-force correctness + LSH recall."""

from __future__ import annotations

import pyspark.sql.functions as F

from kg_curation_spark.operators.ann import brute_force_cosine_topk, lsh_cosine_topk

SF = "/root/testdata/sf0.001"


def test_brute_force_finds_duplicate_vector(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    # plant an exact duplicate of vec 0 with id 9999
    dup = emb.filter(F.col("vec_id") == 0).select(
        F.lit(9999).cast("long").alias("vec_id"),
        F.col("embedding"),
        F.lit(0).alias("label"),
    )
    all_vecs = emb.unionByName(dup)
    top = brute_force_cosine_topk(
        all_vecs, all_vecs.filter(F.col("vec_id") == 0), k=1
    ).first()
    assert top["neighbor_id"] == 9999
    assert top["cosine"] == 1.0


def test_lsh_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_cosine_topk(emb, queries, k=5)
    approx = lsh_cosine_topk(emb, queries, k=5, n_planes=4, n_tables=4, dim=64)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall {recall:.2f} too low"


def test_lsh_scores_are_exact_cosines(spark):
    """LSH only prunes candidates; scores it returns must equal exact."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_cosine_topk(emb, queries, k=500).collect()
    }
    for r in lsh_cosine_topk(emb, queries, k=5, n_planes=4, n_tables=4, dim=64).collect():
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cosine"]
