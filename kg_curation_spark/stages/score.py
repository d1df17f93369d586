"""Stage 2b — feature joins + batched scoring of candidate links.

For every (subject, predicate, literal) x candidate entity:

  lex_score    token-Jaccard from candidate gen (stage 2a)
  link_feat    does the KB hold any (subject, p', cand) or (cand, p', subject)
               edge? (LinkFeat, util_encode.py:129-139 — J3 composite-key
               self-join, re-expressed as two semi-join probes)
  node_feat    candidate appears >1 times as object of this predicate
               (NodeFeat, util_encode.py:105-127 — J4 count join)
  emb_score    TransE over (subject, predicate, cand) vectors, zeros for
               missing ids (J10/F8, predict_embedding.py:128-156), batched
               numpy in a pandas UDF
  model_score  plausibility inference — deterministic logistic stand-in for
               the AttBiRNN scorer (M8, util_nn.py:90-108): broadcast weight
               vector, Arrow-batch matrix multiply via mapInPandas. Training
               is pluggable/driver-side per SURVEY §2.8 M7.

Output: scored(subject, predicate, literal, literal_norm, entity,
              lex_score, link_feat, node_feat, emb_score, model_score)

Scale notes: kge vectors join via broadcast (dimension table); the KB probes
are semi-join shaped (left_semi/left join + groupBy on the probe key) so the
big side shuffles once on each probe key; AQE handles candidate-side skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text

# deterministic stand-in weights for the plausibility model (M8): logistic
# over [lex, link, node, emb, bias]. A real deployment drops a trained
# checkpoint here; the Spark-side inference plumbing is identical. Weights
# lean on subject-context signals (link_feat, emb) — lexical overlap alone
# must not clear the decision threshold, or must-eliminate assertions whose
# literal resembles some entity label get wrongly corrected.
MODEL_W = np.array([1.2, 2.2, 0.3, 1.5, -3.4], dtype="float64")

MODEL_FEATURES = ["lex_score", "link_feat", "node_feat", "emb_score"]

# Dimension tables up to this many rows get an explicit broadcast hint.
# Budget rationale: at dim 16 float32 a row is ~64 B + overhead, so 10M rows
# ~ 0.6-1 GB — the upper bound of what production clusters ship as a
# broadcast (embedding tables are routinely broadcast at this size); beyond
# it the join falls back to shuffle. A bytes-based budget (rows x dim x 4)
# is the production refinement.
BROADCAST_MAX_ROWS = 10_000_000


def attach_features(
    assertions: DataFrame,
    candidates: DataFrame,
    kb_triples: DataFrame,
    kge: DataFrame,
) -> DataFrame:
    """assertions x candidates (on normalized literal) + KB feature joins."""
    a = assertions.withColumn("literal_norm", normalize_text("literal"))
    cand = a.join(candidates, "literal_norm")  # fan-out join; AQE skew-split

    # LinkFeat: any KB edge between subject and candidate, either direction
    pairs = kb_triples.select(F.col("s").alias("subject"), F.col("o").alias("entity")).unionByName(
        kb_triples.select(F.col("o").alias("subject"), F.col("s").alias("entity"))
    ).distinct().withColumn("link_feat", F.lit(1.0))
    cand = cand.join(pairs, ["subject", "entity"], "left").fillna(
        {"link_feat": 0.0}
    )

    # NodeFeat: #{(p, o=entity)} > 1 in KB (util_encode.py:105-109)
    po_counts = kb_triples.groupBy(
        F.col("p").alias("predicate"), F.col("o").alias("entity")
    ).agg(F.count(F.lit(1)).alias("__n"))
    cand = (
        cand.join(po_counts, ["predicate", "entity"], "left")
        .withColumn(
            "node_feat", F.when(F.coalesce("__n", F.lit(0)) > 1, 1.0).otherwise(0.0)
        )
        .drop("__n")
    )

    # Embedding attach (J10): dimension joins, zeros for missing. The
    # entity-vector side grows with the corpus, so broadcast is gated on an
    # explicit row budget (a 1000-executor cluster cannot ship a multi-GB
    # hash relation everywhere); under the budget the broadcast hint saves
    # the shuffle. AQE still auto-broadcasts when post-UDF stats are known.
    evec = kge.filter(F.col("kind") == "e").select("id", "vec")
    rvec = kge.filter(F.col("kind") == "r").select("id", "vec")
    if evec.limit(BROADCAST_MAX_ROWS + 1).count() <= BROADCAST_MAX_ROWS:
        evec = F.broadcast(evec)
    rvec = F.broadcast(rvec)  # relation vocabulary is always small
    cand = (
        cand.join(evec.withColumnRenamed("id", "subject").withColumnRenamed("vec", "s_vec"), "subject", "left")
        .join(rvec.withColumnRenamed("id", "predicate").withColumnRenamed("vec", "r_vec"), "predicate", "left")
        .join(evec.withColumnRenamed("id", "entity").withColumnRenamed("vec", "o_vec"), "entity", "left")
    )
    return cand


def _stack(col: pd.Series, dim: int) -> np.ndarray:
    out = np.zeros((len(col), dim), dtype="float64")
    mask = col.notna()
    if mask.any():
        out[mask.to_numpy()] = np.stack(col[mask].to_numpy())
    return out


def _score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """TransE (F8) + plausibility logistic (M8) in ONE Arrow pass — the
    vector columns enter Python exactly once."""
    for pdf in batches:
        dim = next(
            (len(v) for v in pdf["s_vec"] if v is not None), 16
        )
        sv = _stack(pdf["s_vec"], dim)
        rv = _stack(pdf["r_vec"], dim)
        ov = _stack(pdf["o_vec"], dim)
        d = np.abs(sv + rv - ov).mean(axis=1)
        pdf["emb_score"] = 1.0 / (1.0 + np.exp(-1.0 / np.maximum(d, 1e-9)))
        x = pdf[MODEL_FEATURES].to_numpy(dtype="float64")
        z = x @ MODEL_W[:-1] + MODEL_W[-1]
        pdf["model_score"] = 1.0 / (1.0 + np.exp(-z))
        yield pdf.drop(columns=["s_vec", "r_vec", "o_vec"])


def apply_plausibility_model(scored: DataFrame) -> DataFrame:
    """Batch inference over Arrow batches (mapInPandas) — M8 surface."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    keep = [f for f in scored.schema.fields if not f.name.endswith("_vec")]
    schema = StructType(
        keep
        + [StructField("emb_score", DoubleType()), StructField("model_score", DoubleType())]
    )
    return scored.mapInPandas(_score_batches, schema=schema)


def score_candidates(
    assertions: DataFrame,
    candidates: DataFrame,
    kb_triples: DataFrame,
    kge: DataFrame,
) -> DataFrame:
    feats = attach_features(assertions, candidates, kb_triples, kge)
    return apply_plausibility_model(feats)
