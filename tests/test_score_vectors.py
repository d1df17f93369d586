"""M2 full graph-feature vectors (util_encode.py:96-180) — LinkFeat 2|P|
and ClassFeat |C|+|P|+|C| blocks, and their pass-through the M8 scorer."""

from __future__ import annotations

from kg_curation_spark.stages.score import apply_plausibility_model, graph_feature_vectors


def _kb(spark):
    return spark.createDataFrame(
        [("a", "p1", "b"), ("b", "p2", "a"), ("a", "p2", "c")],
        "s string, p string, o string",
    )


def test_linkfeat_vector_bits(spark):
    cand = spark.createDataFrame(
        [("a", "p1", "b"), ("a", "p1", "c")],
        "subject string, predicate string, entity string",
    )
    out = {
        (r["subject"], r["entity"]): r["link_vec"]
        for r in graph_feature_vectors(cand, _kb(spark), ["p1", "p2"]).collect()
    }
    # (a,p1,b): fwd p1 skipped (own predicate), fwd p2 absent; bwd p2 holds
    assert out[("a", "b")] == [0.0, 0.0, 0.0, 1.0]
    # (a,p1,c): fwd p2 holds (a,p2,c); no backward edge
    assert out[("a", "c")] == [0.0, 1.0, 0.0, 0.0]


def test_classfeat_one_hot_block(spark):
    cand = spark.createDataFrame(
        [("a", "p1", "b")], "subject string, predicate string, entity string"
    )
    ec = spark.createDataFrame(
        [("a", "cX"), ("b", "cY"), ("b", "cX")], "entity string, class string"
    )
    row = graph_feature_vectors(
        cand, _kb(spark), ["p1", "p2"], entity_class=ec, classes=["cX", "cY"]
    ).first()
    # subject classes ++ predicate one-hot ++ object classes
    assert row["class_vec"] == [1.0, 0.0, 1.0, 0.0, 1.0, 1.0]


def test_vector_block_flows_through_model_without_shifting_scores(spark):
    cand = spark.createDataFrame(
        [("a", "p1", "b", 0.9, 1.0, 0.0, [0.1] * 16, [0.0] * 16, [0.2] * 16)],
        "subject string, predicate string, entity string, lex_score double, "
        "link_feat double, node_feat double, s_vec array<float>, "
        "r_vec array<float>, o_vec array<float>",
    )
    base = apply_plausibility_model(cand).first()["model_score"]
    withvec = apply_plausibility_model(
        graph_feature_vectors(cand, _kb(spark), ["p1", "p2"])
    ).first()
    assert "link_vec" not in withvec.asDict()  # consumed, not emitted
    assert abs(withvec["model_score"] - base) < 1e-12


def test_native_scores_match_pandas_scores(spark):
    """apply_plausibility_native must reproduce the mapInPandas stand-in
    bit-for-bit-ish (same float64 formulas) — it replaces it in the hot
    path at corpus scale."""
    import pyspark.sql.functions as F

    from kg_curation_spark.stages.score import apply_plausibility_native

    rows = [
        ("a", "p1", "b", 0.9, 1.0, 0.0, [0.1] * 16, [0.0] * 16, [0.2] * 16),
        ("a", "p1", "c", 0.4, 0.0, 1.0, None, [0.05] * 16, [0.2] * 16),
        ("x", "p2", "y", 0.0, 0.0, 0.0, None, None, None),
    ]
    schema = (
        "subject string, predicate string, entity string, lex_score double, "
        "link_feat double, node_feat double, s_vec array<float>, "
        "r_vec array<float>, o_vec array<float>"
    )
    cand = spark.createDataFrame(rows, schema)
    a = {
        (r["subject"], r["entity"]): (r["emb_score"], r["model_score"])
        for r in apply_plausibility_model(cand).collect()
    }
    b = {
        (r["subject"], r["entity"]): (r["emb_score"], r["model_score"])
        for r in apply_plausibility_native(cand, dim=16).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k][0] - b[k][0]) < 1e-9, (k, a[k], b[k])
        assert abs(a[k][1] - b[k][1]) < 1e-9, (k, a[k], b[k])
