"""ML-surface corpus (SURVEY §2.12): the Arrow pandas_udf inference
seam (oracle-checked — the stand-in model is deterministic math) and
the MLlib training pipeline (rows-only: iterative LBFGS optimization
is not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_energy_gamma_ray_search_in_kascade_array_data_spark.ml import inference, pipeline
from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries.common import SHOWER_CTE, shower_frame
from high_energy_gamma_ray_search_in_kascade_array_data_spark.registry import register

# Fixed stand-in "model": σ(w·x + b) over four shower observables.
_W = (0.8, -0.05, 1.5, 0.02)
_COLS = ("lg_e", "ze", "p", "core_x")
_B = -12.0


@register(
    "pandas_udf_inference",
    survey_ref="M1,§2.12",
    oracle=f"""
WITH {SHOWER_CTE}
SELECT event_id,
       ROUND(1.0 / (1.0 + EXP(-({_W[0]}*lg_e + {_W[1]}*ze + {_W[2]}*p + {_W[3]}*core_x + {_B}))), 6) AS score
FROM shower
""",
)
def q_pandas_udf_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model inference through the Arrow pandas_udf seam
    (replaces the torch DataLoader loop, `tools.py:15-31`): features
    packed into an array column, scored one Arrow batch at a time by a
    vectorized numpy kernel. The stand-in linear-logistic model keeps
    it oracle-checkable; a torch model drops into the same UDF."""
    df = shower_frame(spark, sf_dir)
    feats = F.array(*[F.col(c).cast("double") for c in _COLS])
    score = inference.make_linear_scorer_udf(_W, _B)
    return df.select("event_id", F.round(score(feats), 6).alias("score"))


@register(
    "mllib_lr_pipeline",
    survey_ref="M3,M4,A7",
    oracle=None,  # iterative optimizer: rows-only check
)
def q_mllib_lr_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MLlib head: class weights (A3+M3) → assemble/scale →
    LogisticRegression with weightCol (M4) → confusion matrix (A7) +
    per-class accuracy on a held-out split. Returns one row per
    (label, pred) cell with the class accuracy joined on."""
    df = shower_frame(spark, sf_dir).select("event_id", "label", "lg_e", "ze", "p", "core_x", "core_y")
    train = df.filter(F.col("event_id") % 5 != 0)
    test = df.filter(F.col("event_id") % 5 == 0)
    weighted = pipeline.add_class_weights(train, boost={1: 2.0})
    model = pipeline.fit_lr(weighted, ["lg_e", "ze", "p", "core_x", "core_y"])
    cm = pipeline.confusion_matrix(model.transform(test))
    acc = pipeline.per_class_accuracy(cm)
    return cm.join(acc, "label").select("label", "pred", "n", F.round("accuracy", 6).alias("class_accuracy"))
