"""Embedding / probabilistic scoring functions.

TransE / DistMult / TransH scoring re-expresses OpenKE's score functions
(OpenKE/models/TransE.py:11-58, DistMult.py:11-12, TransH.py:11-17) and the
reference's candidate scorer ``predict_embedding.py:128-136``:
    TransE:   sigmoid(1 / mean(|s + r - o|))
    DistMult: sigmoid(sum(s * r * o))
    TransH:   TransE norm after projecting s and o onto relation r's
              hyperplane (normal vector w, l2-normalized — TransH._transfer):
              e' = e - (e . w_hat) w_hat. The reference's committed golden
              predictions are TransH (DBP-Lite/Data/Predicts_TransH.csv).
as Arrow-batched pandas UDFs over array<float> columns — numpy matrix math
per batch, never per-row Python (input_hint).

Noisy-or (validate_constraint.py:136-152) stays a pure Column aggregate:
    1 - prod(1 - p)  ==  1 - exp(sum(log1p(-p)))
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _stack(col: pd.Series, dim: int) -> np.ndarray:
    """array<float> Series -> (n, dim) float32 matrix; nulls -> zero rows
    (J10: missing embedding -> zeros, predict_embedding.py:145-156)."""
    out = np.zeros((len(col), dim), dtype="float32")
    mask = col.notna()
    if mask.any():
        out[mask.to_numpy()] = np.stack(col[mask].to_numpy())
    return out


@pandas_udf(DoubleType())
def transe_score(s: pd.Series, r: pd.Series, o: pd.Series) -> pd.Series:
    dim = next((len(v) for v in s if v is not None), 16)
    sv, rv, ov = _stack(s, dim), _stack(r, dim), _stack(o, dim)
    d = np.abs(sv + rv - ov).mean(axis=1)
    return pd.Series(1.0 / (1.0 + np.exp(-1.0 / np.maximum(d, 1e-9))))


@pandas_udf(DoubleType())
def distmult_score(s: pd.Series, r: pd.Series, o: pd.Series) -> pd.Series:
    dim = next((len(v) for v in s if v is not None), 16)
    sv, rv, ov = _stack(s, dim), _stack(r, dim), _stack(o, dim)
    x = (sv.astype("float64") * rv * ov).sum(axis=1)
    return pd.Series(1.0 / (1.0 + np.exp(-x)))


@pandas_udf(DoubleType())
def complex_score(s: pd.Series, r: pd.Series, o: pd.Series) -> pd.Series:
    """ComplEx (OpenKE/models/ComplEx.py:22-23): complex-valued DistMult,
    Re(<h, r, conj(t)>). Each array packs [real half ++ imaginary half];
    score = sigmoid(sum(re_h*re_t*re_r + im_h*im_t*re_r + re_h*im_t*im_r
    - im_h*re_t*im_r)) with the same sigmoid wrapper as DistMult
    (predict_embedding.py:133-136)."""
    dim = next((len(v) for v in s if v is not None), 16)
    half = dim // 2
    sv = _stack(s, dim).astype("float64")
    rv = _stack(r, dim).astype("float64")
    ov = _stack(o, dim).astype("float64")
    re_h, im_h = sv[:, :half], sv[:, half:]
    re_r, im_r = rv[:, :half], rv[:, half:]
    re_t, im_t = ov[:, :half], ov[:, half:]
    x = (
        re_h * re_t * re_r
        + im_h * im_t * re_r
        + re_h * im_t * im_r
        - im_h * re_t * im_r
    ).sum(axis=1)
    return pd.Series(1.0 / (1.0 + np.exp(-x)))


@pandas_udf(DoubleType())
def transh_score(
    s: pd.Series, r: pd.Series, o: pd.Series, w: pd.Series
) -> pd.Series:
    """TransH (OpenKE/models/TransH.py:11-17): project s and o onto r's
    hyperplane via the l2-normalized normal w, then the same
    sigmoid(1 / mean|s' + r - o'|) wrapper the reference applies to TransE
    (predict_embedding.py:128-136). Missing vectors -> zeros (J10)."""
    dim = next((len(v) for v in s if v is not None), 16)
    sv = _stack(s, dim).astype("float64")
    rv = _stack(r, dim).astype("float64")
    ov = _stack(o, dim).astype("float64")
    wv = _stack(w, dim).astype("float64")
    wn = wv / np.maximum(np.linalg.norm(wv, axis=1, keepdims=True), 1e-9)
    sp = sv - (sv * wn).sum(axis=1, keepdims=True) * wn
    op = ov - (ov * wn).sum(axis=1, keepdims=True) * wn
    d = np.abs(sp + rv - op).mean(axis=1)
    return pd.Series(1.0 / (1.0 + np.exp(-1.0 / np.maximum(d, 1e-9))))


def _arr_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_transh_score(
    df, s: str, r: str, o: str, w: str, dim: int, out: str = "score"
):
    """TransH as pure Column expressions (whole-stage codegen, no Arrow
    round-trip — the scale form, mirroring apply_plausibility_native).
    Identity used: with c = ((s - o) . w) / |w|^2,
    |s' + r - o'| = |s + r - o - c * w| componentwise.

    DataFrame-level (not a bare Column) so the per-row projection scalar c
    is hoisted into its own column: Catalyst performs no common-subexpr
    elimination inside higher-order-function lambdas, and inlining c there
    would re-run its O(dim) dot product once per vector element — O(dim^2).
    """
    wn2 = F.greatest(_arr_dot(F.col(w), F.col(w)), F.lit(1e-18))
    c = (_arr_dot(F.col(s), F.col(w)) - _arr_dot(F.col(o), F.col(w))) / wn2
    step = df.withColumn("__thc", c)
    resid = F.zip_with(
        F.zip_with(F.col(s), F.col(r), lambda a, b: (a + b).cast("double")),
        F.zip_with(
            F.col(o),
            F.col(w),
            lambda t, x: t.cast("double") + F.col("__thc") * x.cast("double"),
        ),
        lambda x, y: F.abs(x - y),
    )
    d = F.aggregate(resid, F.lit(0.0), lambda acc, x: acc + x) / float(dim)
    score = 1.0 / (1.0 + F.exp(-1.0 / F.greatest(d, F.lit(1e-9))))
    return step.withColumn(out, score).drop("__thc")


def noisy_or(prob: Column) -> Column:
    """Aggregate: 1 - prod(1 - p). Use inside agg().

    Null-transparent: null inputs contribute nothing (sum skips nulls) and
    an all-null group yields null, so callers can distinguish "no matched
    rate" from a real score. The cap must be guarded — ``least(NULL, cap)``
    would otherwise SKIP the null and feed the cap (≈1.0) into the product.
    """
    capped = F.when(prob.isNotNull(), F.least(prob, F.lit(1.0 - 1e-12)))
    return 1.0 - F.exp(F.sum(F.log1p(-capped)))


def sigmoid(x: Column) -> Column:
    return 1.0 / (1.0 + F.exp(-x))
