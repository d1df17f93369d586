"""Connected components: correctness on known graphs + determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from kg_curation_spark.operators.components import connected_components


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    out = connected_components(df, num_partitions=8)
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
