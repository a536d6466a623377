"""Arrow-vectorized model inference (SURVEY §2.12 M1).

The reference runs CNN inference through a torch ``DataLoader`` batch
loop (``tools.py:15-31``, model ``cnn_model.py:31-43``). The Spark form
is a scalar ``pandas_udf``: executors stream Arrow record batches into
Python, the model scores a whole batch vectorized, and the result
returns as a column — the DataLoader's batching, worker parallelism and
device transfer all map onto partition parallelism + Arrow batching
with no user-visible loop.

The stand-in model here is a linear-logistic scorer (deterministic, no
torch dependency — this container has no GPU/torch, and the engine's
job is the dataflow, not the weights). ``predict_batch_udf`` slots a
real torch/onnx model into the same seam.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def make_linear_scorer_udf(weights: Sequence[float], bias: float):
    """Vectorized σ(w·x + b) over an array<double> feature column.

    One Arrow batch = one vectorized numpy evaluation — the 10-100×
    rule: never a row-at-a-time Python UDF in the hot path.
    """
    import numpy as np

    w = np.asarray(list(weights), dtype="float64")
    b = float(bias)

    @F.pandas_udf(DoubleType())
    def score(features: pd.Series) -> pd.Series:
        mat = np.stack(features.to_numpy())  # (batch, n_features)
        z = mat @ w + b
        return pd.Series(1.0 / (1.0 + np.exp(-z)))

    return score


def linear_score_expr(feature_cols: Sequence[str], weights: Sequence[float], bias: float) -> Column:
    """The same σ(w·x + b) as a pure column expression (JVM-side,
    whole-stage codegen) — the preferred form when the "model" is
    linear; the pandas_udf twin exists to exercise and test the Arrow
    seam a real neural model needs."""
    z = F.lit(float(bias))
    for c, wi in zip(feature_cols, weights):
        z = z + F.col(c) * F.lit(float(wi))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
