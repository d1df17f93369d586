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


def particular_samples(
    assertions: DataFrame,
    candidates: DataFrame,
    kb_triples: DataFrame,
    entity_class: DataFrame,
    entity_label: DataFrame,
    class_pool: DataFrame,
    alpha: int = 10,
    entity_mask: DataFrame | None = None,
) -> DataFrame:
    """M6 (samples.py:54-99): POS/NEG labeled triples per (predicate, class).

    Candidate entities per property come from two lanes —
      lane 1: entities matching the assertions' literals (l_entities),
      lane 2: object-entities of the property in the KB (p_e_subs) with
              their original subjects —
    minus the entity mask. For each candidate class c of p: a sample
    [s, p, e_label] is POS when c in classes(e), NEG when e is typed but
    c not among its classes (untyped entities join out). A (p, c) group
    is kept only when |POS| >= alpha.

    -> (predicate, class, subject, literal, is_pos), duplicates preserved
    (the reference appends per lane x label). One shuffle per lane join;
    the class pool fans out as a broadcast-sized dimension.
    """
    from ..functions.text import normalize_text

    a = assertions.withColumn("literal_norm", normalize_text("literal"))
    lane1 = a.join(
        candidates.select("literal_norm", "entity"), "literal_norm"
    ).select("subject", "predicate", "entity")
    preds = assertions.select("predicate").distinct()
    lane2 = (
        kb_triples.select(
            F.col("s").alias("subject"),
            F.col("p").alias("predicate"),
            F.col("o").alias("entity"),
        )
        .join(F.broadcast(preds), "predicate", "left_semi")
    )
    pairs = lane1.unionByName(lane2)
    if entity_mask is not None:
        pairs = pairs.join(entity_mask.select("entity"), "entity", "left_anti")

    ecls = entity_class.groupBy("entity").agg(
        F.collect_set("class").alias("__classes")
    )
    samples = (
        pairs.join(ecls, "entity")  # inner: untyped entities sample nothing
        .join(F.broadcast(class_pool.select("predicate", "class")), "predicate")
        .withColumn("is_pos", F.array_contains("__classes", F.col("class")))
        .join(entity_label.select("entity", "label"), "entity")
        .select(
            "predicate", "class", "subject",
            F.col("label").alias("literal"), "is_pos",
        )
    )
    kept = (
        samples.filter(F.col("is_pos"))
        .groupBy("predicate", "class")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= alpha)
        .select("predicate", "class")
    )
    return samples.join(kept, ["predicate", "class"], "left_semi")


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
