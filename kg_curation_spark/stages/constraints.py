"""Stage 3 — constraint mining + validation + score merge.

Mining (constraint_mining.py:41-128, re-expressed as two-level hash aggs):

  cardinality(p, max_n)  +  card_dist(p, n, rate)
      n      = #objects per (p, subject)
      rate   = freq(n) / total subjects of p          [A2]
  range_con(p, class, rate)   most-specific classes of p's objects
      most-specific = classes minus any that is an ancestor of another
      class of the same entity (anti-join, U2)        [A3]
  range_gen(p, class, rate)   ancestors of the concrete classes

Validation (validate_constraint.py:48-216):

  card_score  piecewise over (max_n, existing object count, rate dist) [A5]
  range_score noisy-or of rates of candidate's matching classes;
              0 when the entity HAS classes but none match; mean of
              the predicate's con rates when the entity has NO
              classes at all (validate_constraint.py:137-140)       [A4]
  final = (model_score + (card_score + range_score)/2) / 2           [J8]

All pure DataFrame aggregations — partial+final combinable, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scoring import noisy_or


# ---------------------------------------------------------------------------
# Mining


def per_subject_counts(kb_triples: DataFrame) -> DataFrame:
    """-> (s, p, n): distinct objects per (subject, predicate).

    The ONE vocabulary-scale aggregation of the constrain stage — both
    mine_cardinality (the distribution) and cardinality_score (the
    per-candidate existing-count, J9) consume it. Compute it once and pass
    it to both: the groupBy key order (s, p) matches cardinality_score's
    join key order, so the existing-count side needs no extra exchange,
    and Catalyst's ReuseExchange dedupes the underlying kb_triples
    scan+shuffle between the two consumers when they meet in one plan.
    """
    return kb_triples.groupBy("s", "p").agg(F.countDistinct("o").alias("n"))


def mine_cardinality(
    kb_triples: DataFrame, per_subj: DataFrame | None = None
) -> DataFrame:
    """-> (p, n, rate, max_n): distribution of per-subject object counts."""
    if per_subj is None:
        per_subj = per_subject_counts(kb_triples)
    dist = per_subj.groupBy("p", "n").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("p")
    return dist.select(
        "p",
        "n",
        (F.col("freq") / F.sum("freq").over(w)).alias("rate"),
        F.max("n").over(w).alias("max_n"),
    )


def mine_range(
    kb_triples: DataFrame, entity_class: DataFrame, class_ancestor: DataFrame
) -> DataFrame:
    """-> (p, kind: con|gen, class, rate).

    con: most-specific classes of p's objects, rate = |objs of p in c| /
    |objs of p with any class|; gen: ancestors of con classes, same rate
    accounting (constraint_mining.py:71-119).

    Most-specific membership is a property of the ENTITY alone — whether
    class c is shadowed by a more specific class c' of the same entity
    never depends on which predicate references the entity. So the
    ancestor fan-out + anti-join run on the entity_class table directly
    (entity-keyed, |entities| scale) instead of on the (p, entity, class)
    product (predicate-fanout scale) as an earlier form did; the po join
    then attaches predicates to the already-filtered classes. The class
    hierarchy is a dimension table (hundreds of classes) — broadcast.
    """
    po = kb_triples.select("p", F.col("o").alias("entity")).distinct()

    # The class hierarchy is a DIMENSION table (SURVEY: ~hundreds of
    # classes) — read it once driver-side (a bounded dimension collect,
    # like the vocabulary reads in score_candidates) and push the
    # most-specific / ancestor logic into map-side array expressions over
    # per-entity class sets. The previous join-chain form (ancestor fanout
    # -> distinct -> anti-join -> second fanout -> distinct, then two
    # countDistinct branches) was ~10 sequential shuffle stages whose
    # per-stage latency dominated the constrain stage at bench scale
    # (measured 2.7-4.2 s to materialize); this form is 3 shuffles deep
    # (entity set agg, po distinct, count agg) and produces identical rows:
    #   shadowed(E) = union of ancestors of E's classes
    #   con classes = E's classes minus shadowed   (most-specific, A3/U2)
    #   gen classes = union of ancestors of con classes
    # count(*) equals the old countDistinct because po is distinct
    # (p, entity) and the exploded (entity, kind, class) rows are distinct
    # by construction.
    anc_rows = class_ancestor.select("class", "ancestor").distinct().collect()
    anc_map: dict[str, list[str]] = {}
    for r in anc_rows:
        anc_map.setdefault(r["class"], []).append(r["ancestor"])
    empty = F.array().cast("array<string>")
    anc_lit = (
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in anc_map]),
            F.array(*[F.array(*[F.lit(a) for a in al]) for al in anc_map.values()]),
        )
        if anc_map
        else F.map_from_arrays(empty, F.array().cast("array<array<string>>"))
    )

    ec_sets = (
        entity_class.select("entity", "class")
        .groupBy("entity")
        .agg(F.collect_set("class").alias("__cls"))
    )
    anc_of = lambda arr: F.array_distinct(  # noqa: E731
        F.flatten(
            F.transform(arr, lambda c: F.coalesce(F.element_at(anc_lit, c), empty))
        )
    )
    ec_kinds = (
        ec_sets.withColumn("__ms", F.array_except("__cls", anc_of(F.col("__cls"))))
        .select(
            "entity",
            F.explode(
                F.concat(
                    F.transform(
                        "__ms",
                        lambda c: F.struct(
                            F.lit("con").alias("kind"), c.alias("class")
                        ),
                    ),
                    F.transform(
                        anc_of(F.col("__ms")),
                        lambda c: F.struct(
                            F.lit("gen").alias("kind"), c.alias("class")
                        ),
                    ),
                )
            ).alias("kc"),
        )
        .select("entity", F.col("kc.kind").alias("kind"), F.col("kc.class").alias("class"))
    )

    totals = (
        po.join(ec_sets.select("entity"), "entity")
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("total"))
    )
    counts = (
        po.join(ec_kinds, "entity")
        .groupBy("p", "kind", "class")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.join(totals, "p").select(
        "p", "kind", "class", (F.col("cnt") / F.col("total")).alias("rate")
    )


# ---------------------------------------------------------------------------
# Validation


def cardinality_score(
    scored: DataFrame,
    card: DataFrame,
    kb_triples: DataFrame,
    theta: float = 0.9,
    per_subj: DataFrame | None = None,
) -> DataFrame:
    """A5 piecewise score per candidate row.

    existing = #distinct objects already held by (subject, predicate) in the
    KB (J9); adding the candidate makes n_new = existing + 1. Score:
      rate[n_new]                      if n_new <= max_n and rate known
      sum(rate[n >= n_new]) * (1-r)    overflow-tolerant tail mass
      0                                if no constraint for p
    (validate_constraint.py:84-104 semantics, flattened to one join + agg.)

    per_subj: pass per_subject_counts(kb_triples) shared with
    mine_cardinality so the KB aggregates once, not twice.
    """
    if per_subj is None:
        per_subj = per_subject_counts(kb_triples)
    existing = per_subj.select(
        F.col("s").alias("subject"),
        F.col("p").alias("predicate"),
        F.col("n").alias("n_existing"),
    )

    base = scored.join(existing, ["subject", "predicate"], "left").fillna(
        {"n_existing": 0}
    ).withColumn("n_new", F.col("n_existing") + 1)

    # Constraint stats per (predicate, n_new) — derived ENTIRELY from the
    # card dimension: every n_existing value that occurs in the fact comes
    # from the same per-subject aggregation card was built from, so the
    # reachable n_new values are exactly {n+1 : (p, n) in card} ∪ {1}
    # (missing (subject, predicate) pairs land on n_new = 1). Building
    # `need` from card instead of from the fact keeps the heavy
    # scored ⨝ existing join out of the broadcast-build subtree — the fact
    # never executes twice.
    cardp = card.withColumnRenamed("p", "predicate")
    need = (
        cardp.select("predicate", (F.col("n") + 1).alias("n_new"))
        .unionByName(cardp.select("predicate", F.lit(1).alias("n_new")))
        .distinct()
    )
    stats = (
        need.join(cardp, "predicate")
        .groupBy("predicate", "n_new")
        .agg(
            F.max("max_n").alias("max_n"),
            F.sum(F.when(F.col("n") == F.col("n_new"), F.col("rate"))).alias("rate_eq"),
            F.sum(F.when(F.col("n") >= F.col("n_new"), F.col("rate"))).alias("rate_tail"),
        )
    )
    agg = base.join(F.broadcast(stats), ["predicate", "n_new"], "left")
    return agg.withColumn(
        "card_score",
        F.when(F.col("max_n").isNull(), 0.0)
        .when(F.col("rate_eq").isNotNull(), F.col("rate_eq"))
        .when(F.col("n_new") <= F.col("max_n"), F.coalesce("rate_tail", F.lit(0.0)))
        .otherwise(0.0),
    ).drop("max_n", "rate_eq", "rate_tail", "n_new")


def range_score(
    scored: DataFrame, rng: DataFrame, entity_class: DataFrame
) -> DataFrame:
    """A4 noisy-or over the candidate's classes matching p's range.

    The score depends ONLY on (predicate, entity) — the candidate's classes
    vs p's range constraint — never on which (subject, literal) row proposed
    the candidate. So aggregate over the DISTINCT (predicate, entity)
    projection (narrow, map-side-combinable) and left-join the result back
    once. The previous row-keyed form shuffled the fact by entity, grouped
    it by a 4-wide-string row key, and joined the fact again on that key —
    three fact-sized shuffles where one narrow-keyed shuffle suffices
    (measured the constrain stage's 2→8-core scaling drag at 32M quads).

    Classless fallback (validate_constraint.py:137-140): an entity with NO
    entity_class rows scores mean(p's con rates) when p has a constraint —
    not 0. Fused into the SAME (predicate, entity) aggregation: the
    entity_class join flips to LEFT so classless entities keep a row with
    n_cls = 0, and noisy_or over an all-null rate column is null (sum
    ignores nulls), cleanly separating "no class" / "classes, none match" /
    "matched". p_mean is a per-predicate dimension — broadcast.
    """
    con = rng.filter(F.col("kind") == "con").select(
        F.col("p").alias("predicate"), "class", "rate"
    )
    p_mean = con.groupBy("predicate").agg(F.avg("rate").alias("__mean_rate"))
    pe = scored.select("predicate", "entity").distinct()
    pe_agg = (
        pe.join(entity_class, "entity", "left")
        .join(F.broadcast(con), ["predicate", "class"], "left")
        .groupBy("predicate", "entity")
        .agg(
            F.count("class").alias("__n_cls"),
            noisy_or(F.col("rate")).alias("__nor"),
        )
    )
    pe_scores = pe_agg.join(F.broadcast(p_mean), "predicate", "left").select(
        "predicate",
        "entity",
        F.when(F.col("__nor").isNotNull(), F.col("__nor"))
        .when(
            (F.col("__n_cls") == 0) & F.col("__mean_rate").isNotNull(),
            F.col("__mean_rate"),
        )
        .otherwise(F.lit(0.0))
        .alias("range_score"),
    )
    return scored.join(pe_scores, ["predicate", "entity"], "left").fillna(
        {"range_score": 0.0}
    )


def merge_scores(df: DataFrame) -> DataFrame:
    """J8: final = (model + constraint)/2, constraint = mean(card, range)."""
    return df.withColumn(
        "constraint_score", (F.col("card_score") + F.col("range_score")) / 2.0
    ).withColumn(
        "final_score", (F.col("model_score") + F.col("constraint_score")) / 2.0
    )
