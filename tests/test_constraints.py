"""Pin the A4 range_score semantics against the reference's
validate_constraint.py:126-152 `range_score(c_prob, eClasses)`:

  * entity has classes, some match p's con constraint -> noisy-or of the
    matched rates;
  * entity has classes, NONE match                    -> 0.0;
  * entity has NO classes and p HAS a constraint      -> mean(p's rates)
    (the classless fallback, validate_constraint.py:137-140);
  * entity has NO classes and p has NO constraint     -> 0.0.
"""

from __future__ import annotations

import pytest

from kg_curation_spark.stages.constraints import range_score


def _scores(spark, scored_rows, rng_rows, ec_rows):
    scored = spark.createDataFrame(
        scored_rows, ["subject", "predicate", "literal", "entity", "model_score"]
    )
    rng = spark.createDataFrame(rng_rows, ["p", "kind", "class", "rate"])
    ec = spark.createDataFrame(ec_rows, ["entity", "class"])
    out = range_score(scored, rng, ec)
    return {(r.predicate, r.entity): r.range_score for r in out.collect()}


def test_range_score_classless_fallback_and_match_paths(spark):
    rng_rows = [
        ("p1", "con", "City", 0.6),
        ("p1", "con", "Town", 0.2),
        ("p1", "gen", "Place", 0.8),  # gen rows must NOT feed the con score
    ]
    ec_rows = [
        ("e_match", "City"),
        ("e_match", "Country"),
        ("e_nomatch", "Country"),
        # e_classless: no rows at all
    ]
    scored_rows = [
        ("s1", "p1", "lit", "e_match", 0.5),
        ("s1", "p1", "lit", "e_nomatch", 0.5),
        ("s1", "p1", "lit", "e_classless", 0.5),
        ("s1", "p2", "lit", "e_classless", 0.5),  # p2 has no constraint
    ]
    got = _scores(spark, scored_rows, rng_rows, ec_rows)
    # matched: noisy-or of the single matched rate {City: 0.6}
    assert got[("p1", "e_match")] == pytest.approx(0.6)
    # has classes, none match -> 0 (NOT the fallback)
    assert got[("p1", "e_nomatch")] == 0.0
    # classless + constraint -> mean of p1's con rates = (0.6 + 0.2) / 2
    assert got[("p1", "e_classless")] == pytest.approx(0.4)
    # classless + no constraint -> 0
    assert got[("p2", "e_classless")] == 0.0


def test_range_score_noisy_or_multi_match(spark):
    rng_rows = [("p1", "con", "A", 0.5), ("p1", "con", "B", 0.5)]
    ec_rows = [("e", "A"), ("e", "B")]
    scored_rows = [("s", "p1", "l", "e", 0.0)]
    got = _scores(spark, scored_rows, rng_rows, ec_rows)
    # 1 - (1-0.5)(1-0.5)
    assert got[("p1", "e")] == pytest.approx(0.75)
