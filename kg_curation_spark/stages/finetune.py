"""M7 — per-(property, class) fine-tune-then-predict (prediction.py:55-108).

The reference loads one pre-trained AttBiRNN per class, fine-tunes it on
the (p, c) group's POS/NEG particular samples, then scores the group's
test triples. SURVEY §7.2(c) prescribes ``applyInPandas`` so every (p, c)
group fine-tunes in parallel on its own executor slot — the Spark-native
replacement for the reference's serial per-class loop.

Two per-group models:

  * ``model="logistic"`` (default) — a REAL trained model: deterministic
    L2-regularized logistic regression (ml.fit_logistic, IRLS) fit on the
    group's POS/NEG samples, the numpy replacement for the reference's
    per-class TF fine-tune (order-independent: zero init + Newton steps
    depend only on the sample SET).
  * ``model="fisher"`` — the closed-form Fisher-style discriminant
    (w = mean(POS) - mean(NEG), midpoint bias, sigmoid margin), kept
    because it is SQL-expressible: the driver's DuckDB oracle row
    (q:finetune_per_class_scores) replays it exactly, value-checking the
    group-isolation plumbing that both models share.

A TF/torch fine-tune drops into ``_fit_score`` unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def finetune_predict_per_class(
    samples: DataFrame,
    tests: DataFrame,
    feature_cols: list[str],
    keys: list[str] = ("predicate", "class"),
    out_cols: list[str] = ("subject", "literal"),
    model: str = "logistic",
) -> DataFrame:
    """samples: keys + feature_cols + is_pos (labeled particular samples).
    tests:   keys + out_cols + feature_cols (triples to score per group).
    -> tests + score — each (p, c) group fitted on ITS samples only.

    Groups with no samples (alpha-gated away) predict nothing, matching
    prediction.py:71-73 ('class ignored'). model: 'logistic' (trained,
    default) or 'fisher' (closed-form, oracle-replayable) — see module
    docstring. Groups with no NEGATIVES fall back to the Fisher form for
    both models (a one-class logistic is degenerate; the discriminant's
    mu_neg = 0 prior matches the reference's treat-unknown-as-origin).
    """
    keys = list(keys)
    out_cols = list(out_cols)
    s = samples.select(
        *keys,
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col("is_pos").cast("boolean").alias("is_pos"),
        *[F.lit(None).cast("string").alias(c) for c in out_cols],
        F.lit(True).alias("__sample"),
    )
    t = tests.select(
        *keys,
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.lit(None).cast("boolean").alias("is_pos"),
        *[F.col(c).cast("string").alias(c) for c in out_cols],
        F.lit(False).alias("__sample"),
    )
    both = s.unionByName(t)

    schema = StructType(
        [f for f in both.schema.fields if f.name in keys + out_cols]
        + [StructField("score", DoubleType())]
    )

    if model not in ("logistic", "fisher"):
        raise ValueError(f"unknown finetune model {model!r}")

    def _fit_score(pdf: pd.DataFrame) -> pd.DataFrame:
        tr = pdf[pdf["__sample"]]
        te = pdf[~pdf["__sample"]]
        if len(te) == 0 or len(tr) == 0:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        x_tr = tr[feature_cols].to_numpy(dtype="float64")
        y = tr["is_pos"].to_numpy(dtype="bool")
        pos, neg = x_tr[y], x_tr[~y]
        if len(pos) == 0:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        x_te = te[feature_cols].to_numpy(dtype="float64")
        if model == "logistic" and len(neg) > 0:
            from ..ml import fit_logistic

            wb = fit_logistic(x_tr, y.astype("float64"))
            z = x_te @ wb[:-1] + wb[-1]
        else:
            mu_pos = pos.mean(axis=0)
            mu_neg = neg.mean(axis=0) if len(neg) else np.zeros_like(mu_pos)
            w = mu_pos - mu_neg
            b = -float(w @ ((mu_pos + mu_neg) / 2.0))
            z = x_te @ w + b
        out = te[keys + out_cols].copy()
        out["score"] = 1.0 / (1.0 + np.exp(-z))
        return out

    return both.groupBy(*keys).applyInPandas(_fit_score, schema=schema)
