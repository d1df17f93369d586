"""Fixture serializers — reproduce the reference's on-disk output formats
byte-for-byte so stage outputs can be diffed against its committed goldens.

  constraint_cardinality_lines   'p maxN n1;rate1 n2;rate2 ...'
                                 (constraint_mining.py:41-69 writer; sample
                                 Data/Constraint_Cardinality.txt:1-3)
  constraint_range_lines         'p c1;rate1 c2;rate2 ...' sorted by rate
                                 desc (constraint_mining.py:101-119)
  predictions_wide_lines         '"s","p","l","e1 score1",...,"eK scoreK"'
                                 right-padded with '' and %.4f scores
                                 (predict.py:203-208)

These run at export time only — the engine keeps everything long-format
(SURVEY §1.5); padding/wide layout never exists inside the DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def constraint_cardinality_lines(card: DataFrame) -> DataFrame:
    """card(p, n, rate, max_n) -> (p, line) in the reference line format.
    Distribution entries ordered by n asc (the reference iterates the
    counted dict in key order)."""
    pairs = card.groupBy("p", "max_n").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("n", "rate"))),
                lambda s: F.concat_ws(
                    ";", s["n"].cast("string"), F.format_number(s["rate"], 4)
                ),
            ),
            " ",
        ).alias("dist")
    )
    return pairs.select(
        "p",
        F.concat_ws(" ", F.col("p"), F.col("max_n").cast("string"), F.col("dist")).alias("line"),
    )


def constraint_range_lines(rng: DataFrame, kind: str = "con") -> DataFrame:
    """rng(p, kind, class, rate) -> (p, line): classes sorted rate desc,
    tie-break class asc (reference sorts by value desc,
    constraint_mining.py:101-115)."""
    rows = rng.filter(F.col("kind") == kind)
    w = Window.partitionBy("p").orderBy(F.desc("rate"), F.asc("class"))
    ordered = rows.withColumn("rk", F.row_number().over(w))
    return (
        ordered.groupBy("p")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "class", "rate"))),
                    lambda s: F.concat_ws(
                        ";", s["class"], F.format_number(s["rate"], 4)
                    ),
                ),
                " ",
            ).alias("dist")
        )
        .select("p", F.concat_ws(" ", F.col("p"), F.col("dist")).alias("line"))
    )


def predictions_wide_lines(predictions: DataFrame, k: int = 30) -> DataFrame:
    """(s,p,l,entity,score,rank) -> one quoted CSV line per triple, top-k
    'entity score' cells right-padded with '' (predict.py:203-208)."""
    cells = predictions.filter(F.col("rank") <= k).withColumn(
        "cell",
        F.concat_ws(" ", F.col("entity"), F.format_number(F.col("score"), 4)),
    )
    grouped = cells.groupBy("subject", "predicate", "literal").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "cell"))),
            lambda s: s["cell"],
        ).alias("cells")
    )
    padded = grouped.withColumn(
        "cells",
        F.slice(
            F.concat("cells", F.array_repeat(F.lit(""), k)), 1, k
        ),
    )
    quote = lambda c: F.concat(F.lit('"'), c, F.lit('"'))  # noqa: E731
    return padded.select(
        F.concat_ws(
            ",",
            quote(F.col("subject")),
            quote(F.col("predicate")),
            quote(F.col("literal")),
            F.array_join(F.transform("cells", lambda c: F.concat(F.lit('"'), c, F.lit('"'))), ","),
        ).alias("line")
    )
