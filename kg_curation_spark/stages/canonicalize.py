"""Stage 5 — entity canonicalization.

Two parts, per SURVEY.md §4 and the north star stage (3):

  redirect_closure  bounded 2-hop closure of redirect edges
                    (util_kb.py:186-217 — J12): two join rounds + union,
                    no loop needed.
  canonicalize      unbounded connected components over a similarity graph
                    (redirect edges ∪ same-label edges ∪ decided-correction
                    co-reference edges) -> canonical id per entity, via the
                    salted large-star/small-star loop (operators/components).

The components input is explicitly repartitioned before the loop (north
rule); hot entities are defused inside the algorithm (see components.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text
from ..operators.components import connected_components


def redirect_closure(redirects: DataFrame) -> DataFrame:
    """(entity, equivalent) -> 2-hop closure incl. identity, both directions."""
    e1 = redirects.select("entity", "equivalent")
    rev = e1.select(
        F.col("equivalent").alias("entity"), F.col("entity").alias("equivalent")
    )
    sym = e1.unionByName(rev)
    hop2 = (
        sym.alias("a")
        .join(sym.alias("b"), F.col("a.equivalent") == F.col("b.entity"))
        .select(F.col("a.entity").alias("entity"), F.col("b.equivalent").alias("equivalent"))
    )
    ident = (
        sym.select("entity")
        .unionByName(sym.select(F.col("equivalent").alias("entity")))
        .distinct()
        .select("entity", F.col("entity").alias("equivalent"))
    )
    return sym.unionByName(hop2).unionByName(ident).distinct()


def similarity_edges(
    entity_label: DataFrame, redirects: DataFrame
) -> DataFrame:
    """Edges for clustering: redirect pairs + entities sharing a normalized
    label (blocking key = label, so the self-join is an equi-join; a label
    shared by a hot entity set is bounded by the per-label group size)."""
    # identity redirects are clustering no-ops — drop them before the
    # union so the final distinct shuffles only real edges
    red = redirects.select(
        F.col("entity").alias("src"), F.col("equivalent").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    # no pre-distinct on (entity, lab): min() tolerates duplicates and the
    # final edge distinct dedups — a pre-distinct would be one more
    # vocabulary-scale shuffle
    lab = entity_label.select("entity", normalize_text("label").alias("lab"))
    # connect every entity of a label group to the group's min entity —
    # star edges, |group| rows, instead of a quadratic self-join
    rep = lab.groupBy("lab").agg(F.min("entity").alias("dst"))
    same_label = lab.join(rep, "lab").select(F.col("entity").alias("src"), "dst")
    return red.unionByName(same_label).filter(F.col("src") != F.col("dst")).distinct()


def canonicalize(
    entity_label: DataFrame, redirects: DataFrame, num_partitions: int = 32
) -> DataFrame:
    """-> (node, component): canonical cluster id per entity.

    Runs connected_components in ordered-ids mode: entity URIs are already
    totally ordered (lexicographically), so the loop runs directly on the
    names and its min IS the deterministic min-name label. That removes
    the two vocabulary-scale hash joins at init and the name-join +
    rep-groupBy + rep-join at assembly that dominated this stage at 32M
    quads (the similarity graph is star-dominated — label groups and
    redirect alias pairs — so star-freezing leaves only ~1 heavy loop
    round, and the narrow-hashed-id trade-off no longer pays).

    Entities absent from the graph (no same-label peer, no redirect) have
    no row; apply_canonical coalesces them to themselves.
    """
    edges = similarity_edges(entity_label, redirects)
    return connected_components(
        edges, "src", "dst", num_partitions=num_partitions, ordered_ids=True
    )


def apply_canonical(decided: DataFrame, canon: DataFrame) -> DataFrame:
    """Rewrite decided triple objects (and subjects) to canonical ids."""
    c_obj = canon.select(
        F.col("node").alias("object"), F.col("component").alias("object_canon")
    )
    c_sub = canon.select(
        F.col("node").alias("subject"), F.col("component").alias("subject_canon")
    )
    return (
        decided.join(c_obj, "object", "left")
        .join(c_sub, "subject", "left")
        .select(
            F.coalesce("subject_canon", "subject").alias("subject"),
            "predicate",
            F.coalesce("object_canon", "object").alias("object"),
            "score",
            "literal",
            "content_sha",
        )
    )
