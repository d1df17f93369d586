"""Embedding / probabilistic scoring functions.

TransE / DistMult scoring re-expresses OpenKE's score functions
(OpenKE/models/TransE.py:11-58, DistMult.py:11-12) and the reference's
candidate scorer ``predict_embedding.py:128-136``:
    TransE:   sigmoid(1 / mean(|s + r - o|))
    DistMult: sigmoid(sum(s * r * o))
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


def noisy_or(prob: Column) -> Column:
    """Aggregate: 1 - prod(1 - p). Use inside agg()."""
    return 1.0 - F.exp(F.sum(F.log1p(-F.least(prob, F.lit(1.0 - 1e-12)))))


def sigmoid(x: Column) -> Column:
    return 1.0 / (1.0 + F.exp(-x))
