"""Negative sampling for scorer training (M4/M5, predict.py:92-121).

The reference corrupts each positive triple's object (for Tsp) or subject
(for Top) with random entities, rejects corruptions that exist in the KB
(J13 anti-join), and downsamples negatives to |positives|. The reference
uses a global RNG (order-dependent, predict.py:106-119); the rebuild makes
corruption DETERMINISTIC — replacement index = stable_hash32(s,p,o,attempt)
mod |entity pool| against a dictionary-encoded entity table — so tests and
the DuckDB oracle reproduce the sample bit-for-bit and reruns are stable
across cluster sizes (FIXTURES.md §7 determinism contract).

Dictionary encoding (S10, predict_embedding.py:43-83) is the id-assignment
primitive: distinct -> row_number over a deterministic order - 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import stable_hash32


def dictionary_encode(
    df: DataFrame, col: str, id_col: str = "id", num_partitions: int | None = None
) -> DataFrame:
    """-> (col, id) dense ids 0..n-1 ordered by value (deterministic).

    Scale-safe: range-partition the distinct values, rank WITHIN each
    partition (parallel window — every partition is its own window group),
    then add the cumulative partition offsets (a tiny #partitions-row
    broadcast). No global-ordering window — nothing funnels through one
    task, so a billion-row entity vocabulary encodes at full parallelism.
    Output ids are value-ordered and dense regardless of where the range
    boundaries land, so the result is deterministic.
    """
    spark = df.sparkSession
    d = df.select(col).distinct()
    n = num_partitions or spark.sparkContext.defaultParallelism
    # persist pins ONE range partitioning: the boundary sampler reseeds per
    # job, so the counts pass and the final pass must read the same layout
    ranged = (
        d.repartitionByRange(n, F.col(col))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    local = ranged.withColumn(
        "__local",
        F.row_number().over(Window.partitionBy("__pid").orderBy(col)),
    )
    # cumulative offsets: one tiny job over per-partition counts
    counts = sorted(
        (r["__pid"], r["n"])
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.append((pid, acc))
        acc += c
    off = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    return (
        local.join(F.broadcast(off), "__pid")
        .select(col, (F.col("__off") + F.col("__local") - 1).cast("bigint").alias(id_col))
    )


def negative_samples(
    triples: DataFrame,
    entity_pool: DataFrame,
    attempts: int = 5,
    corrupt: str = "o",
) -> DataFrame:
    """-> (s, p, o, attempt) corrupted triples NOT present in the KB.

    entity_pool: one column 'entity'. Each positive spawns `attempts`
    deterministic corruption candidates; existing triples are rejected with
    a left_anti join (J13). Downsampling to |pos| is the caller's
    ``.limit``/``row_number`` choice.
    """
    pool = dictionary_encode(
        entity_pool.select(F.col("entity")), "entity", "eid"
    )
    n_pool = pool.count()

    att = triples.sparkSession.range(attempts).select(
        F.col("id").cast("int").alias("attempt")
    )
    cand = triples.crossJoin(F.broadcast(att)).withColumn(
        "eid",
        stable_hash32(
            F.concat_ws("\x01", "s", "p", "o", F.col("attempt").cast("string"))
        )
        % n_pool,
    )
    corrupted = cand.join(F.broadcast(pool), "eid").drop("eid")
    if corrupt == "o":
        corrupted = corrupted.select(
            "s", "p", F.col("entity").alias("o"), "attempt"
        )
    else:
        corrupted = corrupted.select(
            F.col("entity").alias("s"), "p", "o", "attempt"
        )
    # J13: corruption must not be a real triple; also drop no-op corruptions
    return corrupted.join(
        triples.select("s", "p", "o"), ["s", "p", "o"], "left_anti"
    )


def class_disjoint_pool(
    entity_class: DataFrame, class_joint: DataFrame, target_class: str
) -> DataFrame:
    """M5 (pretrain.py:60-73): negative-sampling pool for a class c =
    entities whose classes are all disjoint from c (anti-join against the
    joint-class table). class_joint: (class, joint_class)."""
    joint = (
        class_joint.filter(F.col("class") == target_class)
        .select(F.col("joint_class").alias("class"))
        .unionByName(
            class_joint.sparkSession.createDataFrame(
                [(target_class,)], "class string"
            )
        )
    )
    bad_entities = entity_class.join(
        F.broadcast(joint), "class", "left_semi"
    ).select("entity")
    return (
        entity_class.select("entity")
        .distinct()
        .join(bad_entities, "entity", "left_anti")
    )
