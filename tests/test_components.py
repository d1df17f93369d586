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
    frozen = _run(spark, edges, freeze_stars=True)
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
        frozen = _run(spark, edges, freeze_stars=True)
        assert frozen == base, f"seed {seed}"
