"""Driver-side model training (M7/M8 training half, ml.py)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from kg_curation_spark.ml import (
    fit_logistic,
    train_plausibility_weights,
    weights_from_df,
    weights_to_df,
)


def test_fit_logistic_separates_and_is_deterministic():
    x = np.array(
        [[0.9, 1.0], [0.8, 0.9], [1.0, 0.7], [0.1, 0.0], [0.0, 0.2], [0.2, 0.1]]
    )
    y = np.array([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    w1 = fit_logistic(x, y)
    w2 = fit_logistic(x, y)
    assert np.array_equal(w1, w2)  # bit-identical: no RNG anywhere
    z = np.hstack([x, np.ones((len(x), 1))]) @ w1
    p = 1.0 / (1.0 + np.exp(-z))
    assert (p[:3] > 0.5).all() and (p[3:] < 0.5).all()


def test_fit_logistic_l2_keeps_separable_fit_finite():
    # perfectly separable 1-d data: unregularized logistic diverges, the
    # L2 term must keep the weights finite and the fit usable
    x = np.array([[1.0], [0.9], [0.1], [0.0]])
    y = np.array([1.0, 1.0, 0.0, 0.0])
    w = fit_logistic(x, y)
    assert np.all(np.isfinite(w))
    assert w[0] > 0  # positive slope toward the positive class


def _tiny_world(spark):
    """A miniature KB where true links are supported by link/lex evidence
    and corrupted ones are not."""
    ents = [f"e{i}" for i in range(40)]
    kb = []
    for i in range(40):
        kb.append((ents[i], "knows", ents[(i + 1) % 40]))
        kb.append((ents[i], "likes", ents[(i + 7) % 40]))
    kb_triples = spark.createDataFrame(kb, "s string, p string, o string")
    entity_label = spark.createDataFrame(
        [(e, f"label {e}") for e in ents], "entity string, label string"
    )
    rng = np.random.default_rng(11)
    kge = spark.createDataFrame(
        [(e, "e", [float(v) for v in rng.normal(size=8)]) for e in ents]
        + [(p, "r", [float(v) for v in rng.normal(size=8)]) for p in ("knows", "likes")],
        "id string, kind string, vec array<float>",
    )
    return kb_triples, entity_label, kge


def test_train_plausibility_weights_learns_lexical_signal(spark):
    kb_triples, entity_label, kge = _tiny_world(spark)
    w = train_plausibility_weights(
        kb_triples, entity_label, kge, n_pos=80, attempts=2
    )
    # layout: [lex, link, node, emb, bias]
    assert w.shape == (5,) and np.all(np.isfinite(w))
    # positives carry lex_score 1.0 (literal IS the object's label) and a
    # KB edge; corrupted entities lose both -> learned weights must point
    # the same way
    assert w[0] > 0.0, w
    # determinism end-to-end (stable-hash sampling + IRLS)
    w2 = train_plausibility_weights(
        kb_triples, entity_label, kge, n_pos=80, attempts=2
    )
    assert np.array_equal(w, w2)


def test_weights_roundtrip_through_dataframe(spark):
    w = np.array([0.5, -1.5, 2.0, 0.25, -3.0])
    assert np.array_equal(weights_from_df(weights_to_df(spark, w)), w)


def test_learned_weights_feed_scorer(spark):
    """score_candidates(model_w=...) must apply the learned vector — a
    weight flip must flip the score ordering."""
    from kg_curation_spark.stages.score import apply_plausibility_native

    rows = spark.createDataFrame(
        [("s", "p", "l", "e1", 1.0, 1.0, 0.0), ("s", "p", "l", "e2", 0.0, 0.0, 0.0)],
        "subject string, predicate string, literal string, entity string, "
        "lex_score double, link_feat double, node_feat double",
    ).withColumn("s_vec", F.lit(None).cast("array<float>")) \
     .withColumn("r_vec", F.lit(None).cast("array<float>")) \
     .withColumn("o_vec", F.lit(None).cast("array<float>"))
    up = np.array([2.0, 2.0, 0.0, 0.0, -1.0])
    down = np.array([-2.0, -2.0, 0.0, 0.0, 1.0])
    s_up = {r["entity"]: r["model_score"]
            for r in apply_plausibility_native(rows, model_w=up).collect()}
    s_dn = {r["entity"]: r["model_score"]
            for r in apply_plausibility_native(rows, model_w=down).collect()}
    assert s_up["e1"] > s_up["e2"]
    assert s_dn["e1"] < s_dn["e2"]
