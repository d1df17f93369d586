"""Entry point B end-to-end: literal typing + canonicalization over the
reference's S-Lite fixture (SURVEY.md §3.2).

Pipeline (mirrors LC quick_run.sh stage order, re-expressed as one DAG):

  1. ingest S-Lite quads (subject, predicate, literal, source_entity) and
     the type ground truth (entity -> [classes]) —
     Literal_Canonicalization/Data/S-Lite/{SData_Clean.csv,
     SData_Type_fixed.json}
  2. KB tables: entity_class from the GT json; kb_triples from the quads'
     (subject, predicate, source_entity); entity labels = literals
     (S-Lite literals are entity names by construction, SData README)
  3. type scores per (predicate, class): property-range scorer (A6 — the
     reference's committed PropertyRange baseline,
     Baselines/property_range.py:40-54; the AttBiRNN scorer M7/M8 plugs
     into the same contract)
  4. typing decision: independent thresholding (typing.py:27-45)
  5. evaluation: mean P/R/F1 of predicted vs GT types (typing.py:43-52)
  6. entity replacement: candidate gen (J1) + typed-entity filter (J14,
     entity_lookup.py:29-66); accuracy vs source_entity
"""

from __future__ import annotations

import csv
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SLITE_DIR = "/root/reference/Literal_Canonicalization/Data/S-Lite"

LC_QUAD_SCHEMA = (
    "subject string, predicate string, literal string, source_entity string"
)


def load_slite(spark: SparkSession, data_dir: str = SLITE_DIR):
    """-> (quads, entity_types) from the reference fixture (data used as
    oracle per SURVEY §5; no reference code involved)."""
    with open(f"{data_dir}/SData_Clean.csv", encoding="utf-8") as f:
        rows = [tuple(r[:4]) for r in csv.reader(f) if len(r) >= 4]
    quads = spark.createDataFrame(rows, LC_QUAD_SCHEMA)
    with open(f"{data_dir}/SData_Type_fixed.json", encoding="utf-8") as f:
        tmap = json.load(f)
    types = spark.createDataFrame(
        [(e, c) for e, cs in tmap.items() for c in cs],
        "entity string, class string",
    )
    return quads, types


def run_lc_pipeline(
    spark: SparkSession,
    quads: DataFrame,
    entity_types: DataFrame,
    iota: float = 0.5,
) -> dict:
    """Returns {'prf': Row, 'replacement_accuracy': float, ...}."""
    from .candidates import generate_candidates
    from .typing import (
        entity_replacement,
        independent_typing,
        property_range_scores,
        typing_prf,
    )

    kb_triples = quads.select(
        F.col("subject").alias("s"),
        F.col("predicate").alias("p"),
        F.col("source_entity").alias("o"),
    )
    # 3. per-property type scores (A6), lifted through the induced class
    # hierarchy (A8): an ancestor class scores at least its best descendant
    from .typing import hierarchical_rollup, induce_class_hierarchy

    base_scores = property_range_scores(kb_triples, entity_types)
    hierarchy = induce_class_hierarchy(entity_types)
    scores = hierarchical_rollup(
        base_scores, hierarchy, ["predicate"]
    ).withColumnRenamed("hscore", "score")

    # 4a. row-aware candidate-class evidence (Baselines/lookup_typing.py
    # semantics): score(c | s,p,l) = best lexical score among the literal's
    # candidate entities that carry class c
    from ..functions.text import normalize_text

    entity_label = quads.select(
        F.col("source_entity").alias("entity"), F.col("literal").alias("label")
    ).distinct()
    cands = generate_candidates(quads, entity_label, k=30).cache()
    cand_cls = (
        cands.join(entity_types, "entity")
        .groupBy("literal_norm", "class")
        .agg(F.max("lex_score").alias("cand_score"))
    )

    # 4b. merge the per-property prior with the row evidence (J8 mean-merge
    # with missing -> 0) and threshold (independent typing)
    keyed = quads.select(
        "subject", "predicate", "literal",
        normalize_text("literal").alias("literal_norm"),
    ).distinct()
    prior = keyed.join(scores, "predicate").select(
        "subject", "predicate", "literal", "literal_norm", "class",
        F.col("score").alias("prior"),
    )
    evid = keyed.join(cand_cls, "literal_norm").select(
        "subject", "predicate", "literal", "literal_norm", "class",
        F.col("cand_score").alias("evid"),
    )
    row_key = ["subject", "predicate", "literal", "literal_norm", "class"]
    type_scores = (
        prior.join(evid, row_key, "full_outer")
        .select(
            *row_key,
            (
                (F.coalesce("prior", F.lit(0.0)) + F.coalesce("evid", F.lit(0.0)))
                / 2.0
            ).alias("score"),
        )
    )
    predicted = independent_typing(
        type_scores, ["subject", "predicate", "literal"], iota=iota
    )

    # 5. mean P/R/F1 vs GT types of the source entity (A9)
    gt = quads.join(
        entity_types, quads.source_entity == entity_types.entity
    ).select("subject", "predicate", "literal", "class")
    prf = typing_prf(predicted, gt, ["subject", "predicate", "literal"]).first()

    # 6. entity replacement over the same candidate set (J14)
    pred_types_by_p = predicted.select("predicate", "class").distinct()
    replaced = entity_replacement(quads, cands, entity_types, pred_types_by_p)
    joined = quads.join(replaced, ["subject", "predicate", "literal"], "left")
    n = joined.count()
    correct = joined.filter(
        F.lower(F.col("replacement")) == F.lower(F.col("source_entity"))
    ).count()
    return {
        "prf": prf,
        "replacement_accuracy": correct / n if n else 0.0,
        "n_assertions": n,
    }


RLITE_DIR = "/root/reference/Literal_Canonicalization/Data/R-Lite"


def load_rlite(spark: SparkSession, data_dir: str = RLITE_DIR):
    """-> (quads, gt_types) from the R-Lite fixture: real literals with GT
    DBO types keyed by 's p l' (RData_Clean.csv + RData_Type.json)."""
    import csv as _csv
    import json as _json

    with open(f"{data_dir}/RData_Clean.csv", encoding="utf-8") as f:
        rows = [tuple(r[:3]) for r in _csv.reader(f) if len(r) >= 3]
    quads = spark.createDataFrame(
        rows, "subject string, predicate string, literal string"
    )
    with open(f"{data_dir}/RData_Type.json", encoding="utf-8") as f:
        tmap = _json.load(f)
    gt = spark.createDataFrame(
        [(k, c) for k, cs in tmap.items() for c in cs], "key string, class string"
    )
    return quads, gt


CD_JSON = (
    "/root/reference/Literal_Canonicalization/Codes/literal_canonicalize/"
    "Cache/class_descendant.json"
)


def load_class_descendant(spark: SparkSession, path: str = CD_JSON) -> DataFrame:
    """(class, descendant) from the reference's rdfs:subClassOf* cache
    (reference DATA used as oracle per SURVEY §5). The SPARQL star operator
    is reflexive, so identity pairs are present; consumers that need strict
    descendants filter them."""
    with open(path, encoding="utf-8") as f:
        d = json.load(f)
    return spark.createDataFrame(
        [(c, dd) for c, ds in d.items() for dd in ds],
        "class string, descendant string",
    )


def rlite_loo_scores(spark: SparkSession, quads: DataFrame, gt_types: DataFrame):
    """-> (loo_scores (key, class, score), gtk (key, predicate, class)):
    leave-one-out property-prior scores — each row scored from the OTHER
    rows of its property, no self-leakage."""
    q = quads.withColumn(
        "key", F.concat_ws(" ", "subject", "predicate", "literal")
    )
    gtk = q.join(gt_types, "key").select("key", "predicate", "class")

    n_p = (
        gtk.select("key", "predicate").distinct()
        .groupBy("predicate").agg(F.count(F.lit(1)).alias("n"))
    )
    cnt = gtk.groupBy("predicate", "class").agg(
        F.countDistinct("key").alias("cnt")
    )
    has = gtk.select("key", "class").withColumn("has", F.lit(1))
    loo = (
        q.select("key", "predicate")
        .join(cnt, "predicate")
        .join(n_p, "predicate")
        .join(has, ["key", "class"], "left")
        .fillna({"has": 0})
        .withColumn(
            "score",
            F.when(
                F.col("n") > 1,
                (F.col("cnt") - F.col("has")) / (F.col("n") - 1),
            ).otherwise(0.0),
        )
    )
    return loo.select("key", "class", "score"), gtk, q


def run_rlite_typing(
    spark: SparkSession,
    quads: DataFrame,
    gt_types: DataFrame,
    iota: float = 0.3,
) -> dict:
    """Leave-one-out property-prior typing on R-Lite (the honest variant of
    the reference's PropertyRange baseline). Returns mean P/R/F1.
    """
    from .typing import independent_typing, typing_prf

    loo, gtk, q = rlite_loo_scores(spark, quads, gt_types)
    pred = independent_typing(loo, ["key"], iota=iota)
    prf = typing_prf(pred, gtk.select("key", "class"), ["key"]).first()
    return {"prf": prf, "n_assertions": q.count()}
