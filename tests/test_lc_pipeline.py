"""Entry point B gate: typing + replacement on the reference S-Lite fixture."""

from __future__ import annotations

from kg_curation_spark.stages.lc_pipeline import load_slite, run_lc_pipeline


def test_slite_typing_and_replacement(spark):
    quads, types = load_slite(spark)
    quads = quads.cache()
    assert quads.count() > 1500  # 1,746 rows per BASELINE.md

    out = run_lc_pipeline(spark, quads, types)
    prf = out["prf"]
    # property prior + candidate-class evidence: far above the paper's
    # PropertyRange/Lookup S-Lite baselines (~0.76 / ~0.85 Avg-F1)
    assert prf["mean_f1"] >= 0.95, dict(prf.asDict())
    assert prf["mean_recall"] >= 0.99
    # literal == entity label in S-Lite -> replacement is near-exact
    assert out["replacement_accuracy"] >= 0.99, out


def test_rlite_loo_typing(spark):
    from kg_curation_spark.stages.lc_pipeline import load_rlite, run_rlite_typing

    quads, gt = load_rlite(spark)
    out = run_rlite_typing(spark, quads, gt)
    prf = out["prf"]
    # leave-one-out: must beat the paper's (self-inclusive) PropertyRange
    # R-Lite baseline (~0.76 Avg-F1)
    assert prf["mean_f1"] >= 0.78, dict(prf.asDict())
    assert prf["mean_recall"] >= 0.80
    assert out["n_assertions"] == 821  # BASELINE.md anchor
