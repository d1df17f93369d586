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
