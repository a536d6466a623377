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
