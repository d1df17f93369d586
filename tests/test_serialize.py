"""Reference output-format parity (shape of committed golden files)."""

from __future__ import annotations

from kg_curation_spark.stages.serialize import (
    constraint_cardinality_lines,
    constraint_range_lines,
    predictions_wide_lines,
)


def test_cardinality_line_format(spark):
    card = spark.createDataFrame(
        [("p:a", 1, 0.75, 2), ("p:a", 2, 0.25, 2), ("p:b", 1, 1.0, 1)],
        "p string, n int, rate double, max_n int",
    )
    lines = {r["p"]: r["line"] for r in constraint_cardinality_lines(card).collect()}
    assert lines["p:a"] == "p:a 2 1;0.7500 2;0.2500"
    assert lines["p:b"] == "p:b 1 1;1.0000"


def test_range_line_sorted_by_rate_desc(spark):
    rng = spark.createDataFrame(
        [("p:a", "con", "c:X", 0.2), ("p:a", "con", "c:Y", 0.8),
         ("p:a", "gen", "c:Z", 1.0)],
        "p string, kind string, class string, rate double",
    )
    lines = {r["p"]: r["line"] for r in constraint_range_lines(rng, "con").collect()}
    assert lines["p:a"] == "p:a c:Y;0.8000 c:X;0.2000"


def test_predictions_wide_padding(spark):
    preds = spark.createDataFrame(
        [("s", "p", "l", "e1", 0.91234, 1), ("s", "p", "l", "e2", 0.5, 2)],
        "subject string, predicate string, literal string, entity string, score double, rank int",
    )
    line = predictions_wide_lines(preds, k=4).first()["line"]
    assert line.startswith('"s","p","l","e1 0.9123","e2 0.5000","",""')
