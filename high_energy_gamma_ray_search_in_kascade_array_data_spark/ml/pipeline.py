"""MLlib estimator pipeline (SURVEY §2.12 M3/M4, §7 M3).

Replaces the reference's sklearn stacking head
(``train_classification.py:276-282``: ``LogisticRegression(C=0.1)`` on
CNN outputs with the 80× proton class weight at ``:234-236``) with
MLlib ``LogisticRegression`` + ``weightCol``. Fitted state persists via
MLlib ML persistence (``PipelineModel.save/load``) — the Spark form of
the reference's joblib scaler/LR checkpoints
(``train_classification.py:202-207``, ``evaluate_classification.py:54-57``).

Parameter note (SURVEY §7 risk 2): sklearn's ``C`` and MLlib's
``regParam`` are NOT a unit conversion (regParam ≈ 1/(C·n)); parity is
validated by golden outputs on pinned fixtures, not parameter
translation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_class_weights(df: DataFrame, label_col: str = "label", boost: dict[int, float] | None = None) -> DataFrame:
    """weight = 1/class_count, optionally boosted per class (the
    reference's ``weight[proton] *= 80``). Computed as a broadcast join
    of the tiny per-class count relation — no driver collect."""
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("_n"))
    out = df.join(F.broadcast(counts), label_col)
    w = F.lit(1.0) / F.col("_n")
    for cls, mult in (boost or {}).items():
        w = F.when(F.col(label_col) == cls, F.lit(float(mult)) / F.col("_n")).otherwise(w)
    return out.withColumn("weight", w).drop("_n")


def fit_lr(train: DataFrame, feature_cols: list[str], label_col: str = "label",
           weight_col: str | None = "weight", reg_param: float = 0.1):
    """Fit MLlib LogisticRegression on named feature columns; returns
    the fitted PipelineModel (assembler + scaler + LR)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    stages = [
        VectorAssembler(inputCols=feature_cols, outputCol="_features_raw"),
        StandardScaler(inputCol="_features_raw", outputCol="features", withMean=True, withStd=True),
    ]
    lr = LogisticRegression(
        featuresCol="features", labelCol=label_col, regParam=reg_param, maxIter=50
    )
    if weight_col is not None:
        lr = lr.setWeightCol(weight_col)
    return Pipeline(stages=[*stages, lr]).fit(train)


def expand_polynomial(
    df: DataFrame, feature_cols: list[str], degree: int = 2, out_col: str = "poly"
) -> DataFrame:
    """MLlib ``PolynomialExpansion`` over named columns (SURVEY §2 M5:
    the reference constructs ``PolynomialFeatures(degree=2)`` at
    ``train_classification.py:271-274`` / ``evaluate_classification.py:98-100``
    but bypasses it; implemented here so enabling it is a config flip,
    not a port). Output is the expanded terms as an array column —
    exact IEEE products of the inputs, so downstream oracles can check
    them hash-exactly.

    Term-layout caveat vs sklearn ``PolynomialFeatures(degree=2)``:
    MLlib emits NO bias term and orders terms variable-major —
    (x, x², y, x·y, y²) for inputs (x, y) — while sklearn's default
    prepends a constant-1 column and orders degree-major
    (1, x, y, x², x·y, y²). Oracles must compare MLlib's term set
    positionally (see ``queries/ml.py::q_polynomial_features``); append
    a constant-1 slot if sklearn column alignment is required."""
    from pyspark.ml.feature import PolynomialExpansion, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    assembled = VectorAssembler(inputCols=feature_cols, outputCol="_pf_raw").transform(df)
    expanded = PolynomialExpansion(degree=degree, inputCol="_pf_raw", outputCol="_pf").transform(
        assembled
    )
    return expanded.withColumn(out_col, vector_to_array("_pf")).drop("_pf_raw", "_pf")


def confusion_matrix(scored: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> DataFrame:
    """(label, pred, n) — the confusion matrix the reference intended
    but never filled (``train_classification.py:118,131,151-152``)."""
    return (
        scored.groupBy(
            F.col(label_col).cast("int").alias("label"),
            F.col(pred_col).cast("int").alias("pred"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def per_class_accuracy(cm: DataFrame) -> DataFrame:
    """Per-class accuracy from the confusion matrix (gm/pr_accuracy,
    ``train_classification.py:151-152``)."""
    totals = cm.groupBy("label").agg(F.sum("n").alias("total"))
    correct = cm.filter(F.col("label") == F.col("pred")).select("label", F.col("n").alias("correct"))
    return (
        totals.join(correct, "label", "left")
        .select(
            "label",
            (F.coalesce(F.col("correct"), F.lit(0)) / F.col("total")).alias("accuracy"),
        )
    )
