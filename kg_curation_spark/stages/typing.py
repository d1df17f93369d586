"""Entry point B — literal canonicalization: semantic typing of literals,
then replacement by a typed entity (SURVEY.md §3.2).

Re-expressed stages (all pure DataFrame ops):

  candidate_classes   A7 (classes.py:39-54): candidate type pool per
                      property = classes of p's objects UNION classes of
                      the literal's candidate entities.
  property_range_scores
                      A6 (Baselines/property_range.py:40-54): score(c|p) =
                      |{e in objects(p) : c in classes(e)}| / |objects(p)|.
                      This is the reference's committed baseline scorer; the
                      NN scorer (M7/M8) plugs into the same (s,p,l,class,
                      score) contract via mapInPandas.
  hierarchical_rollup A8 (typing.py:56-68): Hscore(c) = max(score(c),
                      max over descendants d of score(d)).
  independent_typing  typing.py:27-45: predicted types = {c : score >= iota}.
  entity_replacement  J14 (entity_lookup.py:29-66): first (min-rank)
                      candidate entity whose classes intersect the
                      predicted types.
  typing_prf          A9 (typing.py:43-52): mean precision/recall/F1 of
                      predicted vs GT types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_classes(
    assertions: DataFrame,
    candidates: DataFrame,
    kb_triples: DataFrame,
    entity_class: DataFrame,
) -> DataFrame:
    """-> (predicate, class) candidate type pool per property (A7)."""
    from ..functions.text import normalize_text

    p_obj_classes = (
        kb_triples.select(F.col("p").alias("predicate"), F.col("o").alias("entity"))
        .distinct()
        .join(entity_class, "entity")
        .select("predicate", "class")
    )
    lit_cand_classes = (
        assertions.withColumn("literal_norm", normalize_text("literal"))
        .select("predicate", "literal_norm")
        .distinct()
        .join(candidates, "literal_norm")
        .select("predicate", "entity")
        .distinct()
        .join(entity_class, "entity")
        .select("predicate", "class")
    )
    return p_obj_classes.unionByName(lit_cand_classes).distinct()


def property_range_scores(
    kb_triples: DataFrame, entity_class: DataFrame
) -> DataFrame:
    """-> (predicate, class, score): P(c | p) over p's object entities (A6)."""
    po = kb_triples.select(
        F.col("p").alias("predicate"), F.col("o").alias("entity")
    ).distinct()
    totals = po.groupBy("predicate").agg(F.countDistinct("entity").alias("total"))
    counts = (
        po.join(entity_class, "entity")
        .groupBy("predicate", "class")
        .agg(F.countDistinct("entity").alias("cnt"))
    )
    return counts.join(totals, "predicate").select(
        "predicate", "class", (F.col("cnt") / F.col("total")).alias("score")
    )


def hierarchical_rollup(
    scores: DataFrame, class_descendant: DataFrame, keys: list[str]
) -> DataFrame:
    """A8: Hscore(c) = max(score(c), max over descendants). class_descendant
    is (class, descendant) WITHOUT the identity pair (added here)."""
    ident = class_descendant.select(F.col("class")).distinct().select(
        "class", F.col("class").alias("descendant")
    )
    cd = class_descendant.unionByName(ident).distinct()
    desc_scores = (
        scores.withColumnRenamed("class", "descendant")
        .join(cd, "descendant")
        .groupBy(*keys, "class")
        .agg(F.max("score").alias("hscore"))
    )
    # classes never appearing as a hierarchy node keep their own score
    own = scores.join(
        cd.select("class").distinct(), "class", "left_anti"
    ).select(*keys, "class", F.col("score").alias("hscore"))
    return desc_scores.unionByName(own)


def independent_typing(
    type_scores: DataFrame, keys: list[str], iota: float = 0.5
) -> DataFrame:
    """-> keys + (class): predicted types = score >= iota."""
    return type_scores.filter(F.col("score") >= iota).select(*keys, "class")


def kappa_margin_gate(
    hscores: DataFrame,
    class_descendant: DataFrame,
    keys: list[str],
    kappa: float = 0.0,
    score_col: str = "hscore",
) -> DataFrame:
    """typing.py:87-96 disjoint-margin: keep class c only when
    Hscore(c) - max(Hscore(c') : c' disjoint from c) >= kappa, where two
    classes are disjoint iff neither is an ancestor/descendant of the
    other. No disjoint class present -> margin vs 0.0 (reference's
    max_disjoint_score initial value).

    The per-key class-pair self-join is blocked by the key columns, so at
    scale its cost is sum over keys of |classes-per-key|^2 — never a global
    cross join.
    """
    cd = class_descendant.select("class", "descendant").filter(
        F.col("class") != F.col("descendant")
    )
    related = cd.unionByName(
        cd.select(
            F.col("descendant").alias("class"), F.col("class").alias("descendant")
        )
    ).distinct()
    other = hscores.select(
        *keys, F.col("class").alias("c_other"), F.col(score_col).alias("h_other")
    )
    disjoint_pairs = (
        hscores.select(*keys, "class")
        .join(other, keys)
        .filter(F.col("c_other") != F.col("class"))
        .join(
            related.select("class", F.col("descendant").alias("c_other")),
            ["class", "c_other"],
            "left_anti",
        )
    )
    disj = disjoint_pairs.groupBy(*keys, "class").agg(
        F.max("h_other").alias("max_disjoint")
    )
    return (
        hscores.join(disj, [*keys, "class"], "left")
        .withColumn("max_disjoint", F.coalesce("max_disjoint", F.lit(0.0)))
        .filter(F.col(score_col) - F.col("max_disjoint") >= kappa)
        .drop("max_disjoint")
    )


def hierarchical_typing(
    scores: DataFrame,
    class_descendant: DataFrame,
    keys: list[str],
    iota: float = 0.5,
    kappa: float = 0.0,
) -> DataFrame:
    """typing.py:71-96 hierarchical decision (the ISWC-2019 paper's second
    headline typing mode): roll scores up the hierarchy (A8), then predict
    c iff Hscore(c) >= iota AND the kappa disjoint-margin holds."""
    h = hierarchical_rollup(scores, class_descendant, keys)
    gated = kappa_margin_gate(h, class_descendant, keys, kappa=kappa)
    return gated.filter(F.col("hscore") >= iota).select(*keys, "class")


def typing_sweep(
    type_scores: DataFrame,
    gt: DataFrame,
    keys: list[str],
    iota_start: float = 0.0,
    iota_end: float = 1.0,
    iota_step: float = 0.01,
    score_col: str = "score",
    grid_values: list[float] | None = None,
) -> DataFrame:
    """typing.py:29-52 iota sweep in ONE pass: -> (iota, mean_precision,
    mean_recall, mean_f1) for every threshold on the grid. The grid is a
    tiny broadcast cross join — predictions for all iotas materialize as
    one filter + one aggregate, not |grid| separate jobs.

    grid_values: explicit iota doubles (e.g. the reference's np.arange
    values, verbatim) — lets the golden-score replay compare score >= iota
    against bit-identical thresholds."""
    spark = type_scores.sparkSession
    if grid_values is not None:
        grid = spark.createDataFrame(
            [(float(v),) for v in grid_values], "iota double"
        )
    else:
        n_steps = int(round((iota_end - iota_start) / iota_step))
        grid = spark.range(n_steps).select(
            F.round(F.lit(iota_start) + F.col("id") * F.lit(iota_step), 9).alias("iota")
        )
    gold = gt.select(*keys, "class").distinct()
    universe = gold.select(*keys).distinct()
    gsize = gold.groupBy(*keys).agg(F.count(F.lit(1)).alias("ngold"))
    pred = (
        type_scores.select(*keys, "class", F.col(score_col).alias("__s"))
        .crossJoin(F.broadcast(grid))
        .filter(F.col("__s") >= F.col("iota"))
    )
    stats = (
        pred.join(gold.withColumn("__g", F.lit(1)), [*keys, "class"], "left")
        .groupBy(*keys, "iota")
        .agg(
            F.count(F.lit(1)).alias("npred"),
            F.sum(F.coalesce("__g", F.lit(0))).alias("ninter"),
        )
    )
    full = (
        universe.crossJoin(F.broadcast(grid))
        .join(stats, [*keys, "iota"], "left")
        .join(gsize, keys)
        .withColumn("npred", F.coalesce("npred", F.lit(0)))
        .withColumn("ninter", F.coalesce("ninter", F.lit(0)))
    )
    prec = F.when(F.col("npred") > 0, F.col("ninter") / F.col("npred")).otherwise(0.0)
    rec = F.when(F.col("ngold") > 0, F.col("ninter") / F.col("ngold")).otherwise(0.0)
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    return (
        full.select("iota", prec.alias("p"), rec.alias("r"), f1.alias("f1"))
        .groupBy("iota")
        .agg(
            F.avg("p").alias("mean_precision"),
            F.avg("r").alias("mean_recall"),
            F.avg("f1").alias("mean_f1"),
        )
    )


def sweep_summary(sweep: DataFrame) -> DataFrame:
    """typing.py:52 'Avg-F1@all, Avg-F1@top5' aggregate of a typing_sweep."""
    top5 = (
        sweep.orderBy(F.desc("mean_f1"), F.asc("iota"))
        .limit(5)
        .agg(F.avg("mean_f1").alias("avg_f1_top5"))
    )
    return sweep.agg(F.avg("mean_f1").alias("avg_f1_all")).crossJoin(top5)


def entity_replacement(
    assertions: DataFrame,
    candidates: DataFrame,
    entity_class: DataFrame,
    predicted_types: DataFrame,
) -> DataFrame:
    """J14: per assertion, the min-rank candidate whose classes intersect
    the predicted types of its (predicate) -> replacement entity."""
    from ..functions.text import normalize_text

    a = assertions.withColumn("literal_norm", normalize_text("literal"))
    cand = a.join(candidates, "literal_norm")
    typed = (
        cand.join(entity_class, "entity")
        .join(predicted_types, ["predicate", "class"], "left_semi")
    )
    return (
        typed.groupBy("subject", "predicate", "literal")
        .agg(F.min_by("entity", F.struct("rank", "entity")).alias("replacement"))
    )


def lookup_typing_types(
    assertions: DataFrame,
    candidates: DataFrame,
    entity_class: DataFrame,
    k: int = 30,
    entity_mask: DataFrame | None = None,
) -> DataFrame:
    """Lookup-typing baseline (Baselines/lookup_typing.py:32-66): the
    predicted types of an assertion are the classes of the literal's top-k
    lookup candidate entities (optionally minus masked entities) — a
    score-free baseline to compare property_range / NN scorers against.

    candidates: (literal_norm, entity, rank). -> (subject, predicate,
    literal, class) distinct predicted types per assertion; feed to
    typing_prf against GT.
    """
    from ..functions.text import normalize_text

    cand = candidates.filter(F.col("rank") <= k).select("literal_norm", "entity")
    if entity_mask is not None:
        cand = cand.join(entity_mask.select("entity"), "entity", "left_anti")
    a = assertions.withColumn("literal_norm", normalize_text("literal"))
    return (
        a.join(cand, "literal_norm")
        .join(entity_class, "entity")
        .select("subject", "predicate", "literal", "class")
        .distinct()
    )


def typing_prf(predicted: DataFrame, gt: DataFrame, keys: list[str]) -> DataFrame:
    """A9: mean precision/recall/F1 of predicted type sets vs GT type sets.

    predicted: keys + class; gt: keys + class. Rows with no prediction count
    precision 0 (reference typing.py:43-52 semantics).
    """
    p_sets = predicted.groupBy(*keys).agg(
        F.collect_set("class").alias("pred")
    )
    g_sets = gt.groupBy(*keys).agg(F.collect_set("class").alias("gold"))
    j = g_sets.join(p_sets, keys, "left").select(
        *keys,
        F.coalesce("pred", F.array().cast("array<string>")).alias("pred"),
        "gold",
    )
    inter = F.size(F.array_intersect("pred", "gold")).cast("double")
    prec = F.when(F.size("pred") > 0, inter / F.size("pred")).otherwise(0.0)
    rec = F.when(F.size("gold") > 0, inter / F.size("gold")).otherwise(0.0)
    per = j.select(
        *keys,
        prec.alias("p"),
        rec.alias("r"),
        F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0).alias("f1"),
    )
    return per.agg(
        F.avg("p").alias("mean_precision"),
        F.avg("r").alias("mean_recall"),
        F.avg("f1").alias("mean_f1"),
    )


def induce_class_hierarchy(entity_class: DataFrame, min_support: int = 5) -> DataFrame:
    """-> (class, descendant): c is an ancestor of d when every entity of d
    also has c (subsumption induced from co-occurrence — gives the rollup a
    hierarchy when no ontology table ships with the data; the reference
    loads the same relation from its class_descendant.json cache).
    min_support guards against tiny classes producing spurious edges."""
    ec = entity_class.select("entity", "class").distinct()
    sizes = ec.groupBy("class").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        ec.alias("a")
        .join(ec.alias("b"), F.col("a.entity") == F.col("b.entity"))
        .filter(F.col("a.class") != F.col("b.class"))
        .groupBy(
            F.col("b.class").alias("class"), F.col("a.class").alias("descendant")
        )
        .agg(F.count(F.lit(1)).alias("both"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("class", "descendant"), "descendant")
        .filter((F.col("both") == F.col("n")) & (F.col("n") >= min_support))
        .select("class", "descendant")
    )
