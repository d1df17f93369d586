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


def test_sparse_indices_equal_dense_nonzero_positions(spark):
    """graph_feature_vectors_sparse must mark exactly the dense form's
    nonzero bit positions, for LinkFeat and ClassFeat, at a vocabulary the
    dense form can still materialize (the equivalence anchor for the
    |P|=1,958 scale mode)."""
    from kg_curation_spark.stages.sampling import dictionary_encode
    from kg_curation_spark.stages.score import graph_feature_vectors_sparse

    props = [f"p{i:02d}" for i in range(16)]
    classes = [f"c{i:02d}" for i in range(6)]
    kb_rows = [
        (f"e{(i * 7) % 9}", props[(i * 5) % 16], f"e{(i * 3) % 9}")
        for i in range(120)
    ]
    kb = spark.createDataFrame(kb_rows, "s string, p string, o string").distinct()
    ec = spark.createDataFrame(
        [(f"e{i}", classes[(i * 5 + j) % 6]) for i in range(9) for j in range(2)],
        "entity string, class string",
    ).distinct()
    cand = spark.createDataFrame(
        [(f"e{i}", props[(i * 11) % 16], f"e{(i + 4) % 9}") for i in range(9)],
        "subject string, predicate string, entity string",
    )
    dense = {
        (r["subject"], r["entity"]): (r["link_vec"], r["class_vec"])
        for r in graph_feature_vectors(
            cand, kb, props, entity_class=ec, classes=classes
        ).collect()
    }
    pindex = dictionary_encode(kb.select("p"), "p", "idx")
    cindex = dictionary_encode(ec.select("class"), "class", "idx")
    sparse = {
        (r["subject"], r["entity"]): (r["link_idx"], r["class_idx"])
        for r in graph_feature_vectors_sparse(
            cand, kb, pindex, len(props),
            entity_class=ec, class_index=cindex, n_classes=len(classes),
        ).collect()
    }
    assert dense.keys() == sparse.keys()
    for k, (lv, cv) in dense.items():
        assert sparse[k][0] == [i for i, x in enumerate(lv) if x > 0], k
        assert sparse[k][1] == [i for i, x in enumerate(cv) if x > 0], k


def test_sparse_model_pass_through_at_2k_properties(spark):
    """The M2 -> M8 vector contract at the reference's own property scale
    (|P| = 1,958, G_properties.csv): score_candidates switches to the
    sparse form above max_vector_vocab, the sparse block flows through the
    Arrow model (zero weights), and scores equal the scalar-feature native
    path — P/R-relevant outputs unchanged."""
    import pyspark.sql.functions as F

    from kg_curation_spark.stages.score import (
        apply_plausibility_native, attach_features, score_candidates,
    )
    from kg_curation_spark.synth import build_kge

    n_props = 1958
    kb = spark.range(6000).select(
        F.concat(F.lit("e"), (F.col("id") * 13 % 800).cast("string")).alias("s"),
        F.concat(F.lit("p"), (F.col("id") % n_props).cast("string")).alias("p"),
        F.concat(F.lit("e"), (F.col("id") * 29 % 800).cast("string")).alias("o"),
    ).distinct()
    assertions = spark.createDataFrame(
        [(f"e{i}", f"p{i}", f"lit {i}") for i in range(40)],
        "subject string, predicate string, literal string",
    )
    candidates = spark.createDataFrame(
        [(f"lit {i}", f"e{(i * 7) % 800}", 0.5, 1) for i in range(40)],
        "literal_norm string, entity string, lex_score double, rank int",
    )
    kge = spark.createDataFrame(
        [("e1", "e", [0.1] * 16), ("p1", "r", [0.2] * 16)],
        "id string, kind string, vec array<float>",
    )
    ec = spark.createDataFrame(
        [(f"e{i}", f"c{i % 40}") for i in range(800)], "entity string, class string"
    )
    sparse_scores = score_candidates(
        assertions, candidates, kb, kge, entity_class=ec,
        vector_features=True, max_vector_vocab=256,
    )
    rows = sparse_scores.collect()
    assert len(rows) == 40
    native = {
        (r["subject"], r["entity"]): (r["emb_score"], r["model_score"])
        for r in apply_plausibility_native(
            attach_features(assertions, candidates, kb, kge), dim=16
        ).collect()
    }
    for r in rows:
        k = (r["subject"], r["entity"])
        # 1e-6: numpy pairwise vs Spark sequential summation order
        assert abs(r["emb_score"] - native[k][0]) < 1e-6
        assert abs(r["model_score"] - native[k][1]) < 1e-6


def test_complex_reduces_to_distmult_when_imaginary_zero(spark):
    """ComplEx with zero imaginary halves IS DistMult on the real halves
    (ComplEx.py:22-23 with e2/r2 = 0) — and with nonzero imaginary parts it
    scores asymmetric pairs differently, which DistMult cannot."""
    import pyspark.sql.functions as F

    from kg_curation_spark.functions.scoring import complex_score, distmult_score

    re_h, re_r, re_t = [0.5, -0.2], [0.3, 0.8], [-0.1, 0.4]
    rows = [
        (1, re_h + [0.0, 0.0], re_r + [0.0, 0.0], re_t + [0.0, 0.0]),
        (2, re_h + [0.7, 0.1], re_r + [0.2, -0.5], re_t + [0.3, 0.9]),
        (3, re_t + [0.3, 0.9], re_r + [0.2, -0.5], re_h + [0.7, 0.1]),  # swapped
    ]
    df = spark.createDataFrame(
        rows, "i int, hv array<float>, rv array<float>, tv array<float>"
    )
    out = {
        r["i"]: (r["cx"], r["dm"])
        for r in df.select(
            "i",
            complex_score("hv", "rv", "tv").alias("cx"),
            distmult_score(
                F.slice("hv", 1, 2), F.slice("rv", 1, 2), F.slice("tv", 1, 2)
            ).alias("dm"),
        ).collect()
    }
    assert abs(out[1][0] - out[1][1]) < 1e-9  # zero-imag == DistMult
    assert abs(out[2][0] - out[3][0]) > 1e-6  # asymmetric under h<->t swap


def test_linkfeat_unordered_pair_probe(spark):
    """attach_features' link_feat probes the UNORDERED (subject, entity)
    pair against KB edges in either direction; a NULL on either side never
    matches (equi-join semantics), even when the KB holds a self-loop that
    a NULL-skipping least/greatest key would collapse onto."""
    from kg_curation_spark.stages.score import attach_features

    kb = spark.createDataFrame(
        [("a", "p1", "b"), ("c", "p2", "a"), ("x", "p3", "x")],
        "s string, p string, o string",
    )
    assertions = spark.createDataFrame(
        [("b", "p1", "l1"), ("a", "p1", "l2"), ("a", "p1", "l3"), ("x", "p1", "l4")],
        "subject string, predicate string, literal string",
    )
    candidates = spark.createDataFrame(
        [("l1", "a", 0.5, 1), ("l2", "c", 0.5, 1), ("l3", "b", 0.5, 1),
         ("l4", None, 0.5, 1)],
        "literal_norm string, entity string, lex_score double, rank int",
    )
    kge = spark.createDataFrame(
        [("a", "e", [0.1] * 16)], "id string, kind string, vec array<float>"
    )
    out = {
        (r["subject"], r["entity"]): r["link_feat"]
        for r in attach_features(assertions, candidates, kb, kge).collect()
    }
    assert out[("b", "a")] == 1.0  # reverse direction of (a, p1, b)
    assert out[("a", "c")] == 1.0  # reverse direction of (c, p2, a)
    assert out[("a", "b")] == 1.0  # forward direction
    assert out[("x", None)] == 0.0  # NULL never matches the (x,p3,x) self-loop
