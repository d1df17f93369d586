"""Connected components: correctness on known graphs + determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from kg_curation_spark.operators.components import connected_components


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    out = connected_components(df, num_partitions=8, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_chains_and_isolate(spark):
    comp = _run(
        spark,
        [("a", "b"), ("b", "c"), ("x", "y"), ("z", "z")],
    )
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert comp["z"] == "z"


def test_long_path_converges(spark):
    # path of 40 nodes — stresses the O(log n) round bound
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(40)]
    comp = _run(spark, edges)
    assert set(comp.values()) == {"n00"}
    assert len(comp) == 41


def test_star_hub(spark):
    # hot hub: one node connected to 200 leaves (large-star case)
    edges = [("hub", f"leaf{i:03d}") for i in range(200)]
    comp = _run(spark, edges)
    assert set(comp.values()) == {"hub"}


def test_component_rep_is_min_name(spark):
    comp = _run(spark, [("q", "m"), ("m", "b"), ("q", "z")])
    assert set(comp.values()) == {"b"}


def test_freeze_stars_equivalent_on_mixed_graph(spark):
    """freeze_stars must produce identical labels on a graph mixing the
    shapes a near-dup similarity graph produces: isolated pairs (freezable
    round 1), triangles, small stars, a long chain (never freezable until
    the end), and a hub."""
    edges = []
    edges += [(f"p{i}a", f"p{i}b") for i in range(30)]  # isolated pairs
    edges += [  # triangles
        e for i in range(10)
        for e in [(f"t{i}x", f"t{i}y"), (f"t{i}y", f"t{i}z"), (f"t{i}z", f"t{i}x")]
    ]
    edges += [(f"s{i // 4}hub", f"s{i // 4}l{i % 4}") for i in range(40)]  # stars
    edges += [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(30)]  # chain
    edges += [("bighub", f"bh{i:03d}") for i in range(100)]  # hub
    base = _run(spark, edges, freeze_stars=False)
    # freeze_min_edges=0 forces the freeze path — the adaptive gate would
    # otherwise skip it at test scale (it only pays above ~1M active edges)
    frozen = _run(spark, edges, freeze_stars=True, freeze_min_edges=0)
    assert frozen == base


def test_freeze_stars_random_graphs_equivalent(spark):
    """Randomized equivalence: Erdős–Rényi-ish sparse graphs, several
    seeds — the two code paths must agree exactly."""
    import random

    for seed in (7, 19, 23):
        rng = random.Random(seed)
        n = 300
        edges = [
            (f"v{rng.randrange(n):03d}", f"v{rng.randrange(n):03d}")
            for _ in range(320)
        ]
        base = _run(spark, edges, freeze_stars=False)
        frozen = _run(spark, edges, freeze_stars=True, freeze_min_edges=0)
        assert frozen == base, f"seed {seed}"
        ordered = _run(spark, edges, ordered_ids=True, freeze_min_edges=0)
        # ordered mode omits self-loop-only nodes (documented contract)
        iso = {n for n, c in base.items() if c == n and n not in ordered}
        assert {n: c for n, c in base.items() if n not in iso} == ordered, seed


def test_canonicalize_ordered_mode_equals_hashed_cc(spark):
    """stages/canonicalize.canonicalize (ordered-ids CC over the names)
    must agree exactly with the hashed CC + min-name-rep form on a graph
    mixing multi-label bridge entities, redirect chains through unlabeled
    entities, redirects inside a group, and cross-group redirect merges."""
    from kg_curation_spark.stages.canonicalize import (
        canonicalize, similarity_edges,
    )

    entity_label = spark.createDataFrame(
        [
            # group "alpha": a1 (rep), a2, a9
            ("a1", "Alpha"), ("a2", "alpha"), ("a9", "ALPHA"),
            # group "beta": b1 (rep), b2
            ("b1", "beta"), ("b2", "Beta"),
            # group "gamma": g1 (rep), g2
            ("g1", "gamma"), ("g2", "Gamma"),
            # multi-label bridge: m1 carries beta AND gamma labels
            ("m1", "beta"), ("m1", "gamma"),
            # singleton group
            ("s1", "solo"),
            # group "delta" merged to alpha via redirect below
            ("d1", "delta"), ("d2", "Delta"),
        ],
        "entity string, label string",
    )
    redirects = spark.createDataFrame(
        [
            ("d2", "x_unlabeled"),      # chain through an unlabeled node
            ("x_unlabeled", "a2"),      # ... lands in group alpha
            ("a1", "a9"),               # redirect inside one group (no-op)
            ("y_only", "z_only"),       # redirect-only component
        ],
        "entity string, equivalent string",
    )
    flat = connected_components(
        similarity_edges(entity_label, redirects), "src", "dst",
        num_partitions=8, ordered_ids=False,
    )
    ordered = canonicalize(entity_label, redirects, num_partitions=8)
    flat_m = {r["node"]: r["component"] for r in flat.collect()}
    got_m = {r["node"]: r["component"] for r in ordered.collect()}
    # ordered-ids mode must agree with the hashed+min-name-rep form exactly
    assert got_m == flat_m
    # spot checks: delta merged into alpha through the unlabeled chain
    assert got_m["d1"] == got_m["a1"] == "a1"
    assert got_m["m1"] == got_m["b1"] == got_m["g1"] == "b1"
    assert got_m["y_only"] == got_m["z_only"] == "y_only"
    # singleton label group: no edge, no row — apply_canonical
    # coalesces it to itself downstream
    assert "s1" not in got_m
