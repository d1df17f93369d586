"""M6 particular samples + M7 per-(p,c) fine-tune (applyInPandas)."""

from __future__ import annotations

import pyspark.sql.functions as F

from kg_curation_spark.stages.finetune import finetune_predict_per_class


def test_per_group_isolation_beats_any_global_linear_model(spark):
    """Two (p,c) groups with OPPOSITE feature polarity: no single global
    linear model separates both, but per-group fine-tuning is exact —
    the reason prediction.py:76-88 fine-tunes per class."""
    samples = spark.createDataFrame(
        [
            ("p", "cA", 1.0, True), ("p", "cA", 0.9, True),
            ("p", "cA", 0.1, False), ("p", "cA", 0.0, False),
            ("p", "cB", 0.0, True), ("p", "cB", 0.1, True),
            ("p", "cB", 0.9, False), ("p", "cB", 1.0, False),
        ],
        "predicate string, class string, x double, is_pos boolean",
    )
    tests = spark.createDataFrame(
        [
            ("p", "cA", "t1", "hi", 0.95), ("p", "cA", "t2", "lo", 0.05),
            ("p", "cB", "t3", "hi", 0.95), ("p", "cB", "t4", "lo", 0.05),
        ],
        "predicate string, class string, subject string, literal string, x double",
    )
    out = {
        r["subject"]: r["score"]
        for r in finetune_predict_per_class(samples, tests, ["x"]).collect()
    }
    assert out["t1"] > 0.5 and out["t2"] < 0.5  # group A: high-x is positive
    assert out["t3"] < 0.5 and out["t4"] > 0.5  # group B: LOW-x is positive


def test_alpha_gated_group_predicts_nothing(spark):
    samples = spark.createDataFrame(
        [("p", "cA", 1.0, True)], "predicate string, class string, x double, is_pos boolean"
    )
    tests = spark.createDataFrame(
        [("p", "cA", "t1", "l", 0.9), ("p", "cGone", "t2", "l", 0.9)],
        "predicate string, class string, subject string, literal string, x double",
    )
    out = finetune_predict_per_class(samples, tests, ["x"]).collect()
    assert {r["subject"] for r in out} == {"t1"}  # cGone: 'class ignored'


def test_slite_finetuned_beats_property_prior(spark):
    """FTF-vs-prior ablation shape on S-Lite (prediction.py fine-tune mode
    vs the PropertyRange baseline): per-(p,c) models fitted on the M6
    particular samples must beat prior-only independent typing."""
    from kg_curation_spark.functions.text import normalize_text
    from kg_curation_spark.stages.candidates import generate_candidates
    from kg_curation_spark.stages.lc_pipeline import load_slite
    from kg_curation_spark.stages.sampling import particular_samples
    from kg_curation_spark.stages.typing import (
        candidate_classes,
        independent_typing,
        property_range_scores,
        typing_prf,
    )

    quads, types = load_slite(spark)
    quads = quads.cache()
    kb_triples = quads.select(
        F.col("subject").alias("s"), F.col("predicate").alias("p"),
        F.col("source_entity").alias("o"),
    )
    entity_label = quads.select(
        F.col("source_entity").alias("entity"), F.col("literal").alias("label")
    ).distinct()
    assertions = quads.select("subject", "predicate", "literal")
    cands = generate_candidates(quads, entity_label, k=30).cache()
    pool = candidate_classes(assertions, cands, kb_triples, types).cache()

    # shared feature tables: per-(p,c) prior + per-(literal,c) evidence
    prior = property_range_scores(kb_triples, types)
    cand_cls = (
        cands.join(types, "entity")
        .groupBy("literal_norm", "class")
        .agg(F.max("lex_score").alias("evid"))
    )

    def with_features(df):  # df: predicate, class, subject, literal (+extras)
        return (
            df.withColumn("literal_norm", normalize_text("literal"))
            .join(cand_cls, ["literal_norm", "class"], "left")
            .join(prior.withColumnRenamed("score", "prior"), ["predicate", "class"], "left")
            .fillna({"evid": 0.0, "prior": 0.0})
        )

    samples = particular_samples(
        assertions, cands, kb_triples, types, entity_label, pool, alpha=5
    )
    tests = assertions.join(pool, "predicate")  # candidate classes per row
    scored = finetune_predict_per_class(
        with_features(samples), with_features(tests), ["evid", "prior"]
    )
    predicted_ft = scored.filter(F.col("score") >= 0.5).select(
        "subject", "predicate", "literal", "class"
    )

    gt = quads.join(types, quads.source_entity == types.entity).select(
        "subject", "predicate", "literal", "class"
    )
    keys = ["subject", "predicate", "literal"]
    f1_ft = typing_prf(predicted_ft, gt, keys).first()["mean_f1"]

    # baseline: prior-only independent typing (PropertyRange form)
    prior_rows = (
        assertions.join(pool, "predicate")
        .join(prior, ["predicate", "class"])
        .select("subject", "predicate", "literal", "class", "score")
    )
    predicted_prior = independent_typing(prior_rows, keys, iota=0.5)
    f1_prior = typing_prf(predicted_prior, gt, keys).first()["mean_f1"]

    assert f1_ft > f1_prior, (f1_ft, f1_prior)
    assert f1_ft >= 0.90, (f1_ft, f1_prior)
