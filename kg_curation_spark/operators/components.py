"""Connected components over an edge DataFrame — iterative fixpoint.

Catalyst has no iterative operator (SURVEY.md §4); this is the hand-written
large-star/small-star loop (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) used by the canonicalize stage: similarity/
redirect edges -> canonical cluster id per entity.

Scale design:
  * node ids are hashed to longs up front with ``xxhash64`` — string URIs
    never shuffle inside the loop; names are joined back once at the end
    (no global-ordering window anywhere — nothing funnels to one task);
  * explicit ``repartition(num, 'u')`` before the loop (north rule);
  * ``localCheckpoint`` each round truncates lineage so round N's plan does
    not replay rounds 1..N-1;
  * convergence = no edge changed; bounded O(log n) rounds;
  * hot hubs (a node with millions of neighbors) are exactly the large-star
    case — their edges route to the minimum neighbor instead of repeatedly
    funnelling through one reducer.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

_obs_seq = itertools.count()


def _symmetrize(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    return edges.unionByName(rev).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 32,
    max_iter: int = 50,
) -> DataFrame:
    """-> (node string, component string); component = min node name in the
    cluster, so output is deterministic regardless of hash values.
    Self-edges tolerated (define isolated nodes)."""
    nodes = (
        edges.select(F.col(src).alias("name"))
        .unionByName(edges.select(F.col(dst).alias("name")))
        .distinct()
        .withColumn("nid", F.xxhash64("name"))
        .cache()
    )

    e = (
        edges.select(F.col(src).alias("name"), F.col(dst).alias("dname"))
        .join(nodes, "name")
        .select(F.col("nid").alias("u"), F.col("dname").alias("name"))
        .join(nodes, "name")
        .select("u", F.col("nid").alias("v"))
    )
    def _checkpoint_with_sig(df):
        """Materialize one round AND collect its edge-set signature in the
        SAME job: the signature is an Observation on the checkpointed plan,
        so convergence costs zero extra Spark jobs per round. bit_xor is
        overflow-free under ANSI mode and edges are distinct (no xor
        cancellation), so (xor of xxhash64, count) identifies the edge set
        order-insensitively."""
        obs = Observation(f"cc_sig_{next(_obs_seq)}")
        out = df.observe(
            obs,
            F.bit_xor(F.xxhash64("u", "v")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).localCheckpoint()
        m = obs.get
        return out, (m["s"], m["n"])

    g, sig_old = _checkpoint_with_sig(
        _symmetrize(e).repartition(num_partitions, "u")
    )
    for _ in range(max_iter):
        # large-star: connect every neighbor v>u to m = min(N(u) ∪ {u})
        nbr_min = g.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
        large = (
            g.filter(F.col("v") > F.col("u"))
            .join(nbr_min, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        keep = g.filter(F.col("v") < F.col("u"))
        g2 = _symmetrize(large.unionByName(keep))

        # small-star: connect all smaller neighbors (and u) to the minimum
        halves = g2.filter(F.col("v") < F.col("u"))
        smin = halves.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            halves.join(smin, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smin.select(F.col("u"), F.col("m").alias("v")))
        )
        # one job per round: checkpoint + fused signature observation
        g_new, sig_new = _checkpoint_with_sig(
            _symmetrize(small).repartition(num_partitions, "u")
        )
        g = g_new
        if sig_new == sig_old:
            break
        sig_old = sig_new

    # After convergence the graph is a union of stars: label = min(u, N(u)).
    labels = (
        g.groupBy("u")
        .agg(F.min("v").alias("c"))
        .select("u", F.least("u", "c").alias("c"))
    )
    all_nodes = nodes.select(F.col("nid").alias("u"))
    labels = all_nodes.join(labels, "u", "left").select(
        "u", F.coalesce("c", F.col("u")).alias("c")
    )

    named = labels.join(
        nodes.select(F.col("nid").alias("u"), F.col("name").alias("node")), "u"
    ).select("node", "c")
    rep = named.groupBy("c").agg(F.min("node").alias("component"))
    out = named.join(rep, "c").select("node", "component")
    nodes.unpersist()
    return out
