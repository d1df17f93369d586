"""Skew handling: salted joins and two-phase salted aggregation.

The reference's data is skewed on hot literals ("Baku", "Paris" repeat many
times — DBP-Lit.csv) and hot entities fan out candidates (SURVEY.md §4).
AQE's skew-join splitting covers sort-merge joins at runtime; these helpers
cover the two cases AQE does not: broadcast-replicated join of a *small*
dimension against a skewed fact key, and hot-key aggregation.

Salting scheme: fact side gets ``salt = pmod(hash(row-unique), S)``; the
dimension side is exploded xS. The salt is dropped post-join, so results are
exactly equal to the unsalted join (proved in tests against the plain plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join skewed ``fact`` to small ``dim`` on equi-keys with S-way salt.

    dim is replicated S times (it must be broadcast-sized); fact rows are
    spread across S sub-keys of each hot key, so no single task receives a
    whole hot key's rows. Equivalent to fact.join(dim, on, how).
    """
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.hash(F.rand(seed=7) * 1e9), F.lit(salt))
    )
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = fact_s.join(F.broadcast(dim_s), on + ["__salt"], how)
    return out.drop("__salt")


def salted_count(df: DataFrame, keys: list[str], salt: int = 16) -> DataFrame:
    """groupBy(keys).count() with an explicit two-phase partial aggregate.

    Spark's hash aggregate already does map-side partial combine; this form
    additionally breaks a single hot *reduce* key across `salt` reducers
    before the final (tiny) combine — the pattern to reach for when one key
    holds >~1/parallelism of all rows.
    """
    partial = (
        df.withColumn("__salt", F.pmod(F.hash(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(salt)))
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias("count"))
