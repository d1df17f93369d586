"""Connected components over an edge DataFrame — iterative fixpoint.

Catalyst has no iterative operator (SURVEY.md §4); this is the hand-written
large-star/small-star loop (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) used by the canonicalize stage: similarity/
redirect edges -> canonical cluster id per entity.

Scale design:
  * two id modes: by default node names are hashed to longs up front with
    ``xxhash64`` so strings never shuffle inside the loop (names joined
    back once at the end); ``ordered_ids=True`` instead runs the loop
    DIRECTLY on the names — the algorithm only needs a total order — which
    wins when freezing leaves few rounds (see connected_components);
    either way no global-ordering window — nothing funnels to one task;
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


def _sym_dedup_by_u(edges: DataFrame, num_partitions: int) -> DataFrame:
    """_symmetrize with the exchange order flipped: repartition by u first,
    dedup (u, v) second. Identical edge set; hash(u) partitioning satisfies
    the dedup aggregate's (u, v) clustering requirement AND every
    groupBy('u')/join-on-u the loop does next, so each symmetrize costs one
    exchange instead of distinct's (u, v) exchange plus a repartition."""
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    return (
        edges.unionByName(rev)
        .filter(F.col("u") != F.col("v"))
        .repartition(num_partitions, "u")
        .dropDuplicates(["u", "v"])
    )


def _cc_loop(
    e: DataFrame,
    num_partitions: int,
    max_iter: int,
    freeze_stars: bool,
    freeze_min_edges: int = 1_000_000,
) -> DataFrame:
    """Large-star/small-star fixpoint over (u, v) edges of ANY ordered
    type (longs or strings — the algorithm only needs a total order).
    -> (u, c): one row per node appearing in the symmetric graph,
    c = minimum node id of its component. Self-loop-only nodes are absent
    (callers decide whether isolated nodes need rows).

    Constraint propagation is disabled while the loop builds its
    checkpoints (restored on exit): ``localCheckpoint`` captures the source
    plan's constraint set into the LogicalRDD, and the loop's self-joins
    leave constraints referencing pre-dedup attribute ids — the final
    ``union`` over frozen parts then crashes Catalyst
    (``UnionBase.rewriteConstraints: key not found: u#…``). With the conf
    off at CAPTURE time the checkpoints store no origin constraints, so
    downstream plans (re-)analyze cleanly with the conf back on. The loop
    loses only inferred IsNotNull pushdowns on its own internal joins,
    whose keys are never null by construction."""
    spark = e.sparkSession
    _CONF = "spark.sql.constraintPropagation.enabled"
    conf_prev = spark.conf.get(_CONF, "true")
    spark.conf.set(_CONF, "false")
    try:
        return _cc_loop_inner(e, num_partitions, max_iter, freeze_stars, freeze_min_edges)
    finally:
        spark.conf.set(_CONF, conf_prev)


def _checkpoint_blocks(df: DataFrame):
    """Best-effort handle on a localCheckpoint'd DataFrame's pinned RDD (the
    LogicalRDD leaf), so the loop can unpersist round N-1's blocks once
    round N is materialized instead of waiting for driver GC — the
    'eager checkpoint pinning' memory-pressure term at 32M-quad scale.
    Returns None (skip hygiene, never crash) if the plan shape differs."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.nodeName() == "LogicalRDD":
            return plan.rdd()
    except Exception:  # noqa: BLE001 - hygiene only, never fail the query
        pass
    return None


def _unpersist_blocks(handle) -> None:
    if handle is not None:
        try:
            handle.unpersist(False)
        except Exception:  # noqa: BLE001
            pass


def _cc_loop_inner(
    e: DataFrame,
    num_partitions: int,
    max_iter: int,
    freeze_stars: bool,
    freeze_min_edges: int,
) -> DataFrame:

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

    def _round_partitions(n_edges: int) -> int:
        """Scale-adaptive round partitioning (guide §2): the active edge
        count is already known for FREE from the fused signature, so size
        each round's shuffle to it — ~200k edges (~2-10 MB of string edges)
        per partition, floored at 1, capped at the caller's num_partitions.
        At scale (edges >> 200k * num_partitions) this is exactly the old
        constant; on a nearly-converged (or small) frontier it stops paying
        num_partitions-task scheduling overhead per round for a handful of
        rows."""
        return max(1, min(num_partitions, n_edges // 200_000 + 1))

    g, sig_old = _checkpoint_with_sig(_sym_dedup_by_u(e, num_partitions))
    g_blocks = _checkpoint_blocks(g)
    frozen_parts: list[DataFrame] = []
    for _ in range(max_iter):
        if sig_old[1] == 0:
            break  # no active edges left — everything frozen or isolated
        # per-node neighborhood min + degree: feeds BOTH the freeze test
        # and large-star's m = min(N(u) ∪ {u})
        stats = g.groupBy("u").agg(
            F.min("v").alias("mn"), F.count(F.lit(1)).alias("deg")
        )
        # ADAPTIVE freeze: the test costs ~4 extra small shuffles, an
        # anti-join and one eager-checkpoint job per round — pure overhead
        # when the active edge set is small enough that re-shuffling it to
        # convergence is cheaper than testing it (tools/freeze_probe.py,
        # post-fix: −40% wall at 3.6M and at 20.8M mixed edges, but +55%
        # on a 150k-edge toy star graph). The round's edge count
        # is already known for free from the fused signature observation,
        # so gate on it per round: large frontier → freeze pays, small
        # frontier → run the stock loop to the fixpoint.
        if freeze_stars and sig_old[1] >= freeze_min_edges:
            leaves = stats.filter(
                (F.col("deg") == 1) & (F.col("mn") < F.col("u"))
            ).select("u", F.col("mn").alias("root"))
            roots = stats.filter(F.col("mn") > F.col("u")).select(
                F.col("u").alias("root"), F.col("deg").alias("rdeg")
            )
            # a leaf's single edge lands on a satisfied root; the component
            # is finished iff ALL rdeg neighbors of that root are such
            # leaves (then {root} ∪ N(root) has no edge leaving it)
            cand = leaves.join(roots, "root")
            done = (
                cand.groupBy("root", "rdeg")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") == F.col("rdeg"))
                .select("root")
            )
            frozen = (
                cand.join(done, "root")
                .select("u", F.col("root").alias("c"))
                .unionByName(
                    done.select(
                        F.col("root").alias("u"), F.col("root").alias("c")
                    )
                )
            )
            # EAGER localCheckpoint: the frozen part must become a stable
            # LogicalRDD leaf before the final union over frozen_parts —
            # lazy checkpoints (eager=False) keep the original plan with
            # attribute ids that UnionBase.rewriteConstraints can no longer
            # resolve once constraint propagation rewrites the union
            # (Catalyst `key not found: u#…`). The cost is one small job
            # per freezing round (the part is the just-finished components
            # only), and the anti-join below then consumes the pinned RDD
            # instead of replaying the freeze joins.
            frozen = frozen.localCheckpoint()
            frozen_parts.append(frozen)
            # self-contained ⇒ dropping rows whose u is frozen removes both
            # directions of every frozen edge
            g = g.join(frozen.select("u"), "u", "left_anti")
        # large-star: connect every neighbor v>u to m = min(N(u) ∪ {u}).
        # stats comes from pre-freeze g, but frozen components are
        # self-contained, so no surviving node's neighborhood changed.
        nbr_min = stats.select("u", F.least("mn", F.col("u")).alias("m"))
        large = (
            g.filter(F.col("v") > F.col("u"))
            .join(nbr_min, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        keep = g.filter(F.col("v") < F.col("u"))
        parts = _round_partitions(sig_old[1])
        # symmetrize via repartition-by-u FIRST, then dropDuplicates:
        # HashPartitioning(u) satisfies the (u, v) clustering the dedup
        # aggregate requires, so the dedup runs in-place on the u-partitioned
        # data and the following groupBy('u') reuses the same partitioning —
        # one exchange per symmetrize instead of two (guide §2.4: two
        # operations keyed the same way share one exchange).
        g2 = _sym_dedup_by_u(large.unionByName(keep), parts)

        # small-star: connect all smaller neighbors (and u) to the minimum
        halves = g2.filter(F.col("v") < F.col("u"))
        smin = halves.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            halves.join(smin, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smin.select(F.col("u"), F.col("m").alias("v")))
        )
        # one job per round: checkpoint + fused signature observation
        g_new, sig_new = _checkpoint_with_sig(_sym_dedup_by_u(small, parts))
        # round N materialized -> round N-1's pinned blocks are dead; free
        # them deterministically instead of waiting for driver GC
        new_blocks = _checkpoint_blocks(g_new)
        _unpersist_blocks(g_blocks)
        g, g_blocks = g_new, new_blocks
        if sig_new == sig_old:
            break
        sig_old = sig_new

    # After convergence the residual graph is a union of stars:
    # label = min(u, N(u)); frozen components carry their root label.
    labels = (
        g.groupBy("u")
        .agg(F.min("v").alias("c"))
        .select("u", F.least("u", "c").alias("c"))
    )
    for fp in frozen_parts:
        labels = labels.unionByName(fp)
    # Materialize the final labels ONCE (they are |nodes| rows — compact),
    # then free the residual graph and every frozen part: storage memory is
    # now bounded by the label table instead of growing with loop rounds
    # (localCheckpoint lineage is truncated, so blocks must outlive every
    # consumer — the compact label checkpoint is that single consumer).
    labels = labels.localCheckpoint()
    _unpersist_blocks(g_blocks)
    for fp in frozen_parts:
        _unpersist_blocks(_checkpoint_blocks(fp))
    return labels


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 32,
    max_iter: int = 50,
    freeze_stars: bool = True,
    ordered_ids: bool = False,
    freeze_min_edges: int = 1_000_000,
) -> DataFrame:
    """-> (node string, component string); component = min node name in the
    cluster, so output is deterministic regardless of hash values.
    Self-edges tolerated (define isolated nodes).

    Session-wide side effect: while the loop runs,
    ``spark.sql.constraintPropagation.enabled`` is disabled on the SHARED
    session conf (restored on exit) — required so localCheckpoint captures
    no origin constraints (see _cc_loop). A concurrent query on the same
    SparkSession during that window runs without constraint propagation
    (losing some inferred IsNotNull pushdowns, never correctness).

    freeze_stars (default on; tools/freeze_probe.py measures −40% wall at
    3.6M and at 20.8M mixed edges, identical labels) is ADAPTIVE: it only
    engages on rounds whose active edge count (free from the fused
    signature) is ≥ freeze_min_edges — below that the extra per-round
    joins + eager checkpoint cost more than they save (measured +55% on a
    150k-edge star graph). Per-round frontier
    reduction: a component is provably
    finished when it is already a star rooted at its minimum: root r has
    only larger neighbors, and every neighbor is a degree-1 leaf whose
    single edge points at r. Such a component is self-contained (no node in
    it has an edge outside), so its labels are final — emit them now and
    drop its edges, and later rounds shuffle only the still-converging
    frontier. On similarity graphs (near-dup clusters: mostly 2-5 node
    components, a few long chains) the frontier collapses after round one
    while the stock loop keeps re-shuffling the whole edge set every round.
    The freeze test piggybacks on the aggregation large-star already needs
    (min + count per node), so a round costs one extra small join, not an
    extra pass over the edges.

    ordered_ids=False (default): node names are hashed to longs up front
    with xxhash64 so strings never shuffle inside the loop; names are
    joined back once at the end, and a per-component min-name pass restores
    the deterministic label. ordered_ids=True skips all of that: the loop
    runs DIRECTLY on the string names — the algorithm only needs a total
    order, and lexicographic order IS one — so the loop's min node is
    already the min name. That removes two vocabulary-scale hash joins at
    init and the name-join + rep-groupBy + rep-join at assembly (measured
    the dominant cost on star-dominated graphs where freeze leaves only
    ~1 heavy round to benefit from narrow 8-byte shuffles). Trade-off:
    loop shuffles carry full strings, so prefer the hashed form when the
    graph needs many rounds. In ordered mode, nodes whose every edge is a
    self-loop get no output row (no other node can reference them; callers
    coalesce to identity)."""
    if ordered_ids:
        e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        labels = _cc_loop(e, num_partitions, max_iter, freeze_stars, freeze_min_edges)
        return labels.select(
            F.col("u").alias("node"), F.col("c").alias("component")
        )

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
    labels = _cc_loop(e, num_partitions, max_iter, freeze_stars, freeze_min_edges)
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
