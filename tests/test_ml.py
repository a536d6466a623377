"""ML-surface tests: fitted-state lifecycle (SURVEY §2.1 S5 — the
reference persists scalers/models with joblib/torch.save and reloads
them in a separate run) and sampling semantics (X2)."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from high_energy_gamma_ray_search_in_kascade_array_data_spark.ml import pipeline
from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries.common import shower_frame

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def test_pipeline_model_persistence_roundtrip(spark, sf_dir):
    """fit → save → load → identical predictions (the cross-run fitted
    state that the reference handles with joblib files, S5)."""
    from pyspark.ml import PipelineModel

    df = shower_frame(spark, sf_dir).select("event_id", "label", "lg_e", "ze", "p")
    weighted = pipeline.add_class_weights(df, boost={1: 2.0})
    model = pipeline.fit_lr(weighted, ["lg_e", "ze", "p"])

    # per-process path: a reused dir can hit transient rename conflicts
    # in the Hadoop local committer when a previous run's dir lingers
    path = os.path.join(SCRATCH, f"lr_model_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    try:
        model.write().overwrite().save(path)
        reloaded = PipelineModel.load(path)

        a = model.transform(df).select("event_id", "prediction")
        b = reloaded.transform(df).select("event_id", F.col("prediction").alias("p2"))
        diff = a.join(b, "event_id").filter(F.col("prediction") != F.col("p2"))
        assert diff.count() == 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_model_artifact_roundtrips_udf(spark, sf_dir):
    """A persisted state-dict artifact (torch-interop .npz) must score
    identically through the executor-side pandas_udf and a driver-side
    reference forward pass — proving the checkpoint→ship→batch-score
    path (M1/S5), not just in-memory math. With torch installed the
    same file loads via torch.from_numpy into CNN_B's fc head."""
    import numpy as np

    from high_energy_gamma_ray_search_in_kascade_array_data_spark.ml import inference
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries.ml import _MLP_INPUT_EXPRS, _mlp_state

    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, f"mlp_rt_{os.getpid()}.npz")
    state = _mlp_state()
    inference.save_model_artifact(path, state)
    try:
        loaded = inference.load_model_artifact(path)
        assert set(loaded) == set(state)
        for k in state:
            assert np.array_equal(loaded[k], state[k])

        df = shower_frame(spark, sf_dir).limit(200)
        feats = F.array(*[F.expr(e).cast("double") for e in _MLP_INPUT_EXPRS])
        score = inference.make_mlp_scorer_udf(path)
        got = {
            r["event_id"]: r["s"]
            for r in df.select("event_id", score(feats).alias("s")).collect()
        }

        # independent driver-side forward pass on the same inputs
        rows = df.selectExpr("event_id", *_MLP_INPUT_EXPRS).collect()
        for row in rows:
            x = np.array(row[1:], dtype="float64")
            for li in (1, 2, 3):
                w, b = state[f"fc{li}.weight"], state[f"fc{li}.bias"]
                x = w @ x + b
                if li != 3:
                    x = np.maximum(x, 0.0)
            expect = 1.0 / (1.0 + np.exp(-x[0]))
            assert abs(got[row["event_id"]] - expect) < 1e-12
    finally:
        os.remove(path)


def test_sample_with_replacement_fraction(spark, sf_dir):
    """df.sample(withReplacement=True) draws ≈ fraction·N rows and is
    deterministic for a fixed seed + partitioning (X2/X3)."""
    df = shower_frame(spark, sf_dir).select("event_id")
    n = df.count()
    s1 = df.sample(withReplacement=True, fraction=0.3, seed=42)
    s2 = df.sample(withReplacement=True, fraction=0.3, seed=42)
    c1, c2 = s1.count(), s2.count()
    assert c1 == c2  # seeded determinism
    assert abs(c1 / n - 0.3) < 0.1  # binomial tolerance at n=1000
    # with replacement: duplicates are possible and allowed
    assert s1.distinct().count() <= c1


def test_class_weights_sum_structure(spark, sf_dir):
    """Each class's total weight = 1 (before boost); boosted class
    scales by the boost factor (M3 semantics)."""
    df = shower_frame(spark, sf_dir)
    weighted = pipeline.add_class_weights(df, boost={1: 80.0})
    sums = {
        r["label"]: r["w"]
        for r in weighted.groupBy("label").agg(F.round(F.sum("weight"), 6).alias("w")).collect()
    }
    assert abs(sums[0] - 1.0) < 1e-6
    assert abs(sums[1] - 80.0) < 1e-6
