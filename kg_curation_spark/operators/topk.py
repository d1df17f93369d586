"""Top-k operators (SURVEY.md §2.5 W1-W4).

The reference computes top-k with ``np.argpartition`` on one box
(predict.py:200-203); distributed, the same semantics are a rank window —
and when k is small and groups are huge, a two-level block top-k that
pre-prunes map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """row_number window, deterministic tie-break required in `order`.

    Rank is 1-based and materialized (the reference's implicit list-position
    rank, evaluate.py:90, made explicit per SURVEY §1.5).
    """
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def block_topk_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Two-level top-k: per-input-partition prune to k (map-side, no shuffle),
    then exact window on the survivors. Equivalent result, ~|groups|*k rows
    shuffled instead of all rows — the W3 'block-wise top-k' scale path.
    ``order`` must be a total order within each group (same contract as
    topk_per_group) or results are nondeterministic.
    """
    pre = Window.partitionBy(F.spark_partition_id(), *group).orderBy(*order)
    pruned = (
        df.withColumn("__r", F.row_number().over(pre))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )
    return topk_per_group(pruned, group, order, k, rank_col)
