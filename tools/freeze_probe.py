"""Re-measure the adaptive star-freeze threshold in connected_components.

The freeze gate (operators/components.py, freeze_min_edges) trades ~4
extra small shuffles + an anti-join per round against shrinking the
frontier; the per-round cost changed when the frozen parts became EAGER
localCheckpoints (one extra small job per freezing round), so the
calibration numbers must be re-taken on the fixed code.

Deterministic synthetic graphs (no external data, no RNG):
  * star-only: n/4 components of 4 leaves — the freeze's worst case
    (everything freezes in round one, so the stock loop converges just
    as fast and the freeze joins are pure overhead).
  * mixed: 80% of edges in 4-leaf stars + 20% in 100-edge chains — the
    near-dup similarity-graph shape (most components tiny, a few long
    convergence tails) where freezing pays: star edges leave the loop in
    round one instead of re-shuffling for the chains' ~7 extra rounds.

Usage: python tools/freeze_probe.py [edges ...]   (default 150k star,
3.6M + 20.8M mixed — the scales the docstrings cite). Prints one JSON
line per (graph, variant) with wall seconds, then a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def star_graph(spark, n_edges: int, leaves: int = 4):
    """Edge i: star s = i // leaves, leaf j = i % leaves. Root name sorts
    below its leaves, so it is the component label."""
    return spark.range(n_edges).select(
        F.format_string("s%012da", (F.col("id") / leaves).cast("long")).alias("src"),
        F.format_string(
            "s%012dl%d", (F.col("id") / leaves).cast("long"), F.col("id") % leaves
        ).alias("dst"),
    )


def chain_graph(spark, n_edges: int, length: int = 100):
    """Edge i: chain c = i // length, position p = i % length — chains of
    `length` edges need ~log2(length) CC rounds to converge."""
    return spark.range(n_edges).select(
        F.format_string(
            "c%012dn%04d", (F.col("id") / length).cast("long"), F.col("id") % length
        ).alias("src"),
        F.format_string(
            "c%012dn%04d", (F.col("id") / length).cast("long"), F.col("id") % length + 1
        ).alias("dst"),
    )


def mixed_graph(spark, n_edges: int):
    n_star = int(n_edges * 0.8)
    return star_graph(spark, n_star).unionByName(
        chain_graph(spark, n_edges - n_star)
    )


def time_cc(edges, **kw) -> tuple[float, int]:
    from kg_curation_spark.operators.components import connected_components

    t0 = time.time()
    n = connected_components(edges, num_partitions=32, **kw).count()
    return time.time() - t0, n


def main() -> None:
    from kg_curation_spark.session import get_spark

    spark = get_spark(app_name="freeze-probe")
    spark.sparkContext.setLogLevel("ERROR")

    scales = [int(s) for s in sys.argv[1:]] or [150_000, 3_600_000, 20_800_000]
    results = []
    for n_edges in scales:
        graph = "star" if n_edges <= 200_000 else "mixed"
        edges = (star_graph if graph == "star" else mixed_graph)(spark, n_edges)
        edges = edges.localCheckpoint()  # exclude generation from timings
        row = {"graph": graph, "edges": n_edges}
        for variant, kw in [
            ("freeze", {"freeze_stars": True, "freeze_min_edges": 0}),
            ("no_freeze", {"freeze_stars": False}),
        ]:
            wall, rows = time_cc(edges, **kw)
            row[variant] = round(wall, 2)
            row[f"{variant}_rows"] = rows
            print(
                json.dumps({"graph": graph, "edges": n_edges, "variant": variant,
                            "wall_s": round(wall, 2), "label_rows": rows}),
                flush=True,
            )
        assert row["freeze_rows"] == row["no_freeze_rows"], row
        row["freeze_vs_stock"] = round(row["freeze"] / row["no_freeze"], 2)
        results.append(row)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
