"""Salted join / aggregation equivalence with unsalted plans."""

from __future__ import annotations

import pyspark.sql.functions as F

from kg_curation_spark.operators.salt import salted_count, salted_join


def test_salted_join_equals_plain_join(spark):
    # skewed fact: one hot key holds ~90% of rows
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    dim = fact.select("k").distinct().withColumn("attr", F.length("k"))
    plain = fact.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s")
    )
    salted = salted_join(fact, dim, on=["k"], salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_equals_plain_count(spark):
    df = spark.range(5000).select(
        (F.col("id") % 3).alias("a"), F.when(F.col("id") % 7 == 0, "x").otherwise("y").alias("b")
    )
    plain = df.groupBy("a", "b").count()
    salted = salted_count(df, ["a", "b"], salt=16)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
