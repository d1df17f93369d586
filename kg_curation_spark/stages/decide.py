"""Stage 4 — top-k ranking + correction decision.

predict.py:200-208 (top-k by score) + evaluate.py:116-183 decision
semantics: the correction for (s, p, l) is the rank-1 candidate iff its
merged score clears the threshold; otherwise the assertion is *eliminated*
(the reference's empty-GT rows are exactly the ones that must fall below
threshold, evaluate.py:52-53).

Output long-format predictions (FIXTURES.md §4) plus the decided triple set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.topk import topk_per_group

TRIPLE_KEY = ["subject", "predicate", "literal"]


def rank_predictions(scored: DataFrame, k: int = 30) -> DataFrame:
    """-> (subject, predicate, literal, entity, score, rank) long format."""
    return topk_per_group(
        scored.withColumnRenamed("final_score", "score"),
        TRIPLE_KEY,
        [F.desc("score"), F.asc("entity")],
        k,
    ).select(*TRIPLE_KEY, "entity", "score", "rank", "content_sha")


def decide(predictions: DataFrame, threshold: float = 0.5) -> DataFrame:
    """rank-1 above threshold -> corrected triple (subject, predicate,
    object=entity); below -> eliminated (no row)."""
    return (
        predictions.filter((F.col("rank") == 1) & (F.col("score") >= threshold))
        .select(
            "subject",
            "predicate",
            F.col("entity").alias("object"),
            "score",
            "literal",
            "content_sha",
        )
    )
