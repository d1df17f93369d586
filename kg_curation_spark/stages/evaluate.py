"""Evaluation DAG — the reference's metric scripts as one-pass aggregations.

  hits@1 / hits@5 / MRR           evaluate.py:70-113       [A10]
  threshold sweep (correction rate, elimination rate, accuracy)
                                  evaluate.py:116-183      [A11]
  recall@k sweep                  evaluate_REE.py:33-51    [A12]
  P/R of emitted triple set vs GT (the BASELINE.json gate), under the
  reference's equivalence: case-fold + redirect-closure match
                                  evaluate.py:64-68        [J6]

All sweeps are a single pass: cross-join the (tiny) grid, conditional aggs —
never a rescan per threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_KEY = ["subject", "predicate", "literal"]


def _match_under_redirects(
    predictions: DataFrame, quads: DataFrame, redirects: DataFrame
) -> DataFrame:
    """predictions x GT with J6 equivalence -> adds is_correct per row."""
    gt_equiv = (
        quads.filter(F.col("gt_entity") != "")
        .join(redirects, quads.gt_entity == redirects.entity, "left")
        .select(
            *TRIPLE_KEY,
            F.lower(F.coalesce("equivalent", "gt_entity")).alias("gt_low"),
        )
        .distinct()
    )
    p = predictions.withColumn("pred_low", F.lower("entity"))
    hit = (
        p.join(
            gt_equiv,
            (p.subject == gt_equiv.subject)
            & (p.predicate == gt_equiv.predicate)
            & (p.literal == gt_equiv.literal)
            & (p.pred_low == gt_equiv.gt_low),
            "left_semi",
        )
        .select(*TRIPLE_KEY, "entity")
        .withColumn("is_correct", F.lit(1))
    )
    return predictions.join(hit, TRIPLE_KEY + ["entity"], "left").fillna(
        {"is_correct": 0}
    )


def ranking_metrics(
    predictions: DataFrame, quads: DataFrame, redirects: DataFrame
) -> DataFrame:
    """-> one row: hits@1, hits@5, mrr over annotated assertions (A10)."""
    annotated = quads.filter(F.col("gt_entity") != "").select(*TRIPLE_KEY)
    marked = _match_under_redirects(predictions, quads, redirects)
    best = (
        marked.filter(F.col("is_correct") == 1)
        .groupBy(*TRIPLE_KEY)
        .agg(F.min("rank").alias("best_rank"))
    )
    per_triple = annotated.join(best, TRIPLE_KEY, "left")
    return per_triple.agg(
        F.avg(F.when(F.col("best_rank") == 1, 1.0).otherwise(0.0)).alias("hits1"),
        F.avg(F.when(F.col("best_rank") <= 5, 1.0).otherwise(0.0)).alias("hits5"),
        F.avg(F.coalesce(1.0 / F.col("best_rank"), F.lit(0.0))).alias("mrr"),
    )


def threshold_sweep(
    predictions: DataFrame,
    quads: DataFrame,
    redirects: DataFrame,
    steps: int = 20,
) -> DataFrame:
    """A11: for each theta, correction rate over annotated rows, elimination
    rate over empty-GT rows, overall accuracy. One pass: rank-1 rows cross-
    joined with the theta grid."""
    marked = _match_under_redirects(
        predictions.filter(F.col("rank") == 1), quads, redirects
    )
    per = quads.select(*TRIPLE_KEY, (F.col("gt_entity") != "").cast("int").alias("has_gt")).join(
        marked.select(*TRIPLE_KEY, "score", "is_correct"), TRIPLE_KEY, "left"
    ).fillna({"score": -1.0, "is_correct": 0})

    grid = predictions.sparkSession.range(steps + 1).select(
        (F.col("id") / steps).alias("theta")
    )
    j = per.crossJoin(F.broadcast(grid))
    corrected = (F.col("score") >= F.col("theta")).cast("int")
    return (
        j.groupBy("theta")
        .agg(
            F.avg(F.when(F.col("has_gt") == 1, corrected * F.col("is_correct"))).alias("correction_rate"),
            F.avg(F.when(F.col("has_gt") == 0, 1 - corrected)).alias("elimination_rate"),
            F.avg(
                F.when(F.col("has_gt") == 1, corrected * F.col("is_correct")).otherwise(
                    1 - corrected
                )
            ).alias("accuracy"),
        )
        .orderBy("theta")
    )


def recall_at_k(
    candidates_ranked: DataFrame,
    quads: DataFrame,
    redirects: DataFrame,
    k_max: int = 30,
) -> DataFrame:
    """A12: candidate-gen recall for k = 1..k_max (one pass, k-grid join)."""
    marked = _match_under_redirects(candidates_ranked, quads, redirects)
    best = (
        marked.filter(F.col("is_correct") == 1)
        .groupBy(*TRIPLE_KEY)
        .agg(F.min("rank").alias("best_rank"))
    )
    annotated = quads.filter(F.col("gt_entity") != "").select(*TRIPLE_KEY)
    per = annotated.join(best, TRIPLE_KEY, "left")
    grid = quads.sparkSession.range(1, k_max + 1).select(F.col("id").alias("k"))
    return (
        per.crossJoin(F.broadcast(grid))
        .groupBy("k")
        .agg(F.avg((F.col("best_rank") <= F.col("k")).cast("double")).alias("recall"))
        .fillna({"recall": 0.0})
        .orderBy("k")
    )


def triple_set_pr(
    decided: DataFrame, quads: DataFrame, redirects: DataFrame
) -> dict:
    """The BASELINE.json gate: precision/recall of emitted (s, p, object)
    vs the reference GT set {(s, p, gt_entity) : gt != ''}, J6 equivalence.
    Returns plain floats (drives a pytest assert)."""
    gt = quads.filter(F.col("gt_entity") != "")
    gt_equiv = gt.join(
        redirects, gt.gt_entity == redirects.entity, "left"
    ).select(
        "subject",
        "predicate",
        F.lower(F.coalesce("equivalent", "gt_entity")).alias("obj_low"),
    ).distinct()

    emitted = decided.select(
        "subject", "predicate", F.lower("object").alias("obj_low")
    ).distinct()
    n_emitted = emitted.count()
    n_gt = gt.select("subject", "predicate", "gt_entity").distinct().count()
    n_hit = emitted.join(
        gt_equiv, ["subject", "predicate", "obj_low"], "left_semi"
    ).count()
    precision = n_hit / n_emitted if n_emitted else 0.0
    recall = n_hit / n_gt if n_gt else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "emitted": n_emitted,
        "gt": n_gt,
        "hit": n_hit,
    }
