"""Unit tests for the distributed CNN_B backprop (``ml/cnn_train.py``).

The load-bearing claim is PARTITION-ORDER INDEPENDENCE: because every
backward tensor is an int64 on a fixed dyadic grid, per-shard gradient
sums add exactly — the distributed result equals the single-node result
bit-for-bit regardless of how events are sharded. These tests pin that
invariant without Spark (the Spark/DuckDB parity is the corpus gate).
"""

from __future__ import annotations

import numpy as np

from high_energy_gamma_ray_search_in_kascade_array_data_spark.ml import cnn, cnn_train


def _eids(n: int) -> np.ndarray:
    return np.arange(n, dtype=np.int64) * cnn_train.TRAIN_MOD


def test_shard_sums_equal_whole_batch_exactly():
    state = cnn.cnn_state()
    eids = _eids(24)
    whole = cnn_train.partition_grads(state, eids)
    # three uneven shards, shuffled order inside each
    rng = np.random.default_rng(7)
    perm = rng.permutation(eids)
    shards = [perm[:5], perm[5:16], perm[16:]]
    summed = {k: np.zeros_like(v) for k, v in whole.items()}
    for sh in shards:
        for k, v in cnn_train.partition_grads(state, sh).items():
            summed[k] += v
    for name, _kind, _n in cnn_train.LAYERS:
        assert (summed[name] == whole[name]).all(), name


def test_gradients_are_nonzero_somewhere():
    """A backward pass that quantizes everything to zero would pass the
    shard test vacuously — require real signal in the fc stack and at
    least one conv layer."""
    grads = cnn_train.partition_grads(cnn.cnn_state(), _eids(24))
    assert np.abs(grads["fc3.weight"]).sum() > 0
    assert np.abs(grads["fc1.weight"]).sum() > 0
    conv_l1 = sum(int(np.abs(grads[f"conv{li}.weight"]).sum()) for li, _, _ in cnn.CONVS)
    assert conv_l1 > 0


def test_update_keeps_weights_on_the_dyadic_grid():
    """Epoch-2 weights must stay exact k/256 rationals (the audited
    forward's exactness precondition)."""
    state = cnn.cnn_state()
    grads = cnn_train.partition_grads(state, _eids(24))
    state2 = cnn_train.updated_int_state(state, grads)
    for name, _kind, _n in cnn_train.LAYERS:
        scaled = state2[name] * 256.0
        assert (scaled == np.rint(scaled)).all(), name


def test_update_matches_integer_checksum_identity():
    """updated_w_checksum = Σ k·2²⁴ − Σ g  (the identity the query and
    oracle both rely on)."""
    state = cnn.cnn_state()
    grads = cnn_train.partition_grads(state, _eids(12))
    wsums = cnn_train.weight_int_sums(state)
    for name, _kind, _n in cnn_train.LAYERS:
        k = np.rint(state[name] * 256).astype(np.int64)
        direct = int((k * (1 << 24) - grads[name].reshape(k.shape)).sum())
        assert direct == wsums[name] - int(grads[name].sum()), name


def test_masks_match_forward_relu_regions():
    """ReLU masks must be computed on PRE-quantization z (floor-quant
    can zero a small positive activation whose mask must stay open)."""
    state = cnn.cnn_state()
    feats, grids, _y = cnn_train.batch_arrays(_eids(6))
    fw = cnn_train.forward_intermediates(state, feats, grids)
    for li, _n_out, _n_in in cnn.CONVS:
        assert fw["cmask"][li].dtype == bool
        assert fw["cmask"][li].any()
    logit2 = cnn.cnn_forward(state, feats, grids)
    assert (fw["logit"] == logit2).all()


def test_gd_training_tracks_float_semantics_within_ulp_budget(spark, sf_dir):
    """Golden-output tolerance gate for M2 float fidelity (r7 VERDICT
    task 5): the engine's training loops are exact fixed-point
    analogues so they can be exact-hash gated cross-engine; this test
    evidences that the SAME loop run in IEEE float64 — the reference's
    semantics (train_classification.py:86-101: forward, loss,
    grad, step) — stays within an explicit quantization budget of the
    fixed-point trajectory, so the dyadic grid is a numerics choice,
    not a semantic drift.

    Budget derivation: each epoch's optimizer step floors every weight
    onto the 2⁻¹⁶ grid (≤ 2⁻¹⁶ error/weight/epoch); a weight error δ
    perturbs the next epoch's mean gradient by ≤ δ·E[x²]-ish ≈ δ·3e3
    here, which the 2⁻¹³ lr scales back to ≤ δ·0.4 — geometric factor
    < 1, so the accumulated gap is ≤ EPOCHS·2⁻¹⁶·(1/(1−0.4)) ≈ 7.6e-5.
    We assert 8·EPOCHS·2⁻¹⁶ ≈ 3.7e-4 (≥4× slack); measured gap at
    sf0.001 is 2.2e-5."""
    import duckdb

    from high_energy_gamma_ray_search_in_kascade_array_data_spark.queries.ml import (
        _GD_EPOCHS,
        _GD_S,
        _GD_SHIFT,
        q_distributed_gd_training,
    )

    got = {r["epoch"]: r for r in q_distributed_gd_training(spark, sf_dir).collect()}
    assert set(got) == set(range(1, _GD_EPOCHS + 1))

    con = duckdb.connect()
    d = con.execute(
        f"""
        SELECT CAST(event_id % 97 AS BIGINT) AS x1,
               CAST(user_id % 89 AS BIGINT) AS x2,
               CAST(3*(event_id % 97) - 2*(user_id % 89) + (event_id % 7) AS BIGINT) AS y
        FROM '{sf_dir}/events.parquet'
        """
    ).fetchnumpy()
    x1 = d["x1"].astype(np.float64)
    x2 = d["x2"].astype(np.float64)
    y = d["y"].astype(np.float64)
    n = len(y)
    lr = 1.0 / (n * (1 << _GD_SHIFT))
    w = np.zeros(3)
    budget = 8 * _GD_EPOCHS * 2.0 ** (-16)
    for epoch in range(1, _GD_EPOCHS + 1):
        r = w[0] + w[1] * x1 + w[2] * x2 - y
        g = np.array([r.sum(), (r * x1).sum(), (r * x2).sum()])
        sar = np.abs(r).sum()
        w = w - lr * g
        row = got[epoch]
        w_fixed = np.array([row["w0"], row["w1"], row["w2"]], dtype=np.float64) / _GD_S
        assert np.abs(w_fixed - w).max() <= budget, (epoch, w_fixed, w)
        # epoch-start L1 loss: fixed-point residuals are y·2¹⁶-scaled
        assert abs(row["sum_abs_resid"] / _GD_S - sar) <= 1e-3 * max(sar, 1.0), epoch
