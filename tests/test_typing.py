"""Literal-canonicalization (typing) stages — entry point B."""

from __future__ import annotations

import pyspark.sql.functions as F

from kg_curation_spark.stages.typing import (
    candidate_classes,
    entity_replacement,
    hierarchical_rollup,
    independent_typing,
    property_range_scores,
    typing_prf,
)


def _kb(spark):
    kb_triples = spark.createDataFrame(
        [
            ("s1", "p:place", "e:Paris"),
            ("s2", "p:place", "e:Berlin"),
            ("s3", "p:place", "e:Rome"),
            ("s4", "p:team", "e:Ajax"),
        ],
        "s string, p string, o string",
    )
    entity_class = spark.createDataFrame(
        [
            ("e:Paris", "c:City"), ("e:Berlin", "c:City"), ("e:Rome", "c:City"),
            ("e:Paris", "c:Capital"), ("e:Berlin", "c:Capital"),
            ("e:Ajax", "c:Team"),
        ],
        "entity string, class string",
    )
    return kb_triples, entity_class


def test_property_range_scores(spark):
    kb, ec = _kb(spark)
    out = {(r["predicate"], r["class"]): r["score"]
           for r in property_range_scores(kb, ec).collect()}
    assert out[("p:place", "c:City")] == 1.0
    assert abs(out[("p:place", "c:Capital")] - 2 / 3) < 1e-12
    assert out[("p:team", "c:Team")] == 1.0


def test_candidate_classes_pool(spark):
    kb, ec = _kb(spark)
    assertions = spark.createDataFrame(
        [("s9", "p:place", "ajax")],
        "subject string, predicate string, literal string",
    )
    candidates = spark.createDataFrame(
        [("ajax", "e:Ajax", 1.0, 1)],
        "literal_norm string, entity string, lex_score double, rank int",
    )
    pool = {(r["predicate"], r["class"])
            for r in candidate_classes(assertions, candidates, kb, ec).collect()}
    # classes of p's objects AND of the literal's candidate entities
    assert ("p:place", "c:City") in pool
    assert ("p:place", "c:Team") in pool  # via candidate e:Ajax


def test_hierarchical_rollup(spark):
    scores = spark.createDataFrame(
        [("t1", "c:Place", 0.2), ("t1", "c:City", 0.9), ("t1", "c:Team", 0.3)],
        "t string, class string, score double",
    )
    cd = spark.createDataFrame(
        [("c:Place", "c:City")], "class string, descendant string"
    )
    out = {(r["t"], r["class"]): r["hscore"]
           for r in hierarchical_rollup(scores, cd, ["t"]).collect()}
    assert out[("t1", "c:Place")] == 0.9  # lifted by descendant City
    assert out[("t1", "c:City")] == 0.9
    assert out[("t1", "c:Team")] == 0.3   # not in hierarchy: own score


def test_entity_replacement_first_typed_candidate(spark):
    assertions = spark.createDataFrame(
        [("s1", "p:place", "paris city")],
        "subject string, predicate string, literal string",
    )
    candidates = spark.createDataFrame(
        [
            ("paris city", "e:ParisBand", 0.9, 1),   # wrong type, rank 1
            ("paris city", "e:Paris", 0.8, 2),       # right type, rank 2
        ],
        "literal_norm string, entity string, lex_score double, rank int",
    )
    ec = spark.createDataFrame(
        [("e:ParisBand", "c:Band"), ("e:Paris", "c:City")],
        "entity string, class string",
    )
    pred_types = spark.createDataFrame(
        [("p:place", "c:City")], "predicate string, class string"
    )
    out = entity_replacement(assertions, candidates, ec, pred_types).collect()
    assert len(out) == 1 and out[0]["replacement"] == "e:Paris"


def test_typing_prf(spark):
    predicted = spark.createDataFrame(
        [("t1", "c:A"), ("t1", "c:B"), ("t2", "c:X")],
        "t string, class string",
    )
    gt = spark.createDataFrame(
        [("t1", "c:A"), ("t2", "c:Y"), ("t3", "c:Z")],
        "t string, class string",
    )
    m = typing_prf(predicted, gt, ["t"]).first()
    # t1: p=0.5 r=1 f=2/3; t2: p=0 r=0 f=0; t3: no pred -> 0,0,0
    assert abs(m["mean_precision"] - 0.5 / 3) < 1e-12
    assert abs(m["mean_recall"] - 1 / 3) < 1e-12
    assert abs(m["mean_f1"] - (2 / 3) / 3) < 1e-12


def test_independent_typing_threshold(spark):
    scores = spark.createDataFrame(
        [("t1", "c:A", 0.6), ("t1", "c:B", 0.4)],
        "t string, class string, score double",
    )
    out = independent_typing(scores, ["t"], iota=0.5).collect()
    assert [(r["t"], r["class"]) for r in out] == [("t1", "c:A")]
