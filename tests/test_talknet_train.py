"""operators/talknet_train.py — M5 head training: finite-difference
gradient checks, exact distributed == local equivalence, and loss
descent on separable data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from talknet_segmentation_batchprocessing_spark.operators.talknet_forward import (
    init_weights,
)
from talknet_segmentation_batchprocessing_spark.operators.talknet_train import (
    _PARAM_KEYS,
    loss_and_grads,
    train_heads_epoch,
)


def _data(rng, n):
    X_av = rng.standard_normal((n, 256))
    X_a = rng.standard_normal((n, 128))
    X_v = rng.standard_normal((n, 128))
    y = rng.integers(0, 2, size=n)
    return X_av, X_a, X_v, y


@pytest.fixture(scope="module")
def w():
    return init_weights(seed=7)


def test_gradients_match_finite_differences(w):
    rng = np.random.default_rng(1)
    X_av, X_a, X_v, y = _data(rng, 12)
    loss, grads = loss_and_grads(w, X_av, X_a, X_v, y)
    eps = 1e-6
    for key in _PARAM_KEYS:
        g = grads[key]
        # probe 3 coordinates per parameter
        flat_idx = rng.choice(g.size, size=min(3, g.size), replace=False)
        for fi in flat_idx:
            idx = np.unravel_index(fi, g.shape)
            wp = {k: v.copy() if k in _PARAM_KEYS else v for k, v in w.items()}
            wp[key] = wp[key].copy()
            wp[key][idx] += eps
            lp, _ = loss_and_grads(wp, X_av, X_a, X_v, y)
            wm = {k: v.copy() if k in _PARAM_KEYS else v for k, v in w.items()}
            wm[key] = wm[key].copy()
            wm[key][idx] -= eps
            lm, _ = loss_and_grads(wm, X_av, X_a, X_v, y)
            fd = (lp - lm) / (2 * eps)
            assert abs(fd - g[idx]) < 1e-6, (key, idx, fd, g[idx])


def test_distributed_step_equals_local_full_batch(spark, w):
    rng = np.random.default_rng(2)
    n = 64
    X_av, X_a, X_v, y = _data(rng, n)
    pdf = pd.DataFrame(
        {
            "av": list(X_av),
            "a": list(X_a),
            "v": list(X_v),
            "label": y.astype(int),
        }
    )
    feats = spark.createDataFrame(pdf).repartition(8)  # many partial grads
    new_w, loss, n_seen = train_heads_epoch(feats, w, lr=0.1)
    assert n_seen == n
    local_loss, local_grads = loss_and_grads(w, X_av, X_a, X_v, y)
    np.testing.assert_allclose(loss, local_loss, rtol=0, atol=1e-9)
    for k in _PARAM_KEYS:
        np.testing.assert_allclose(
            new_w[k], w[k] - 0.1 * local_grads[k], rtol=0, atol=1e-9
        )


def test_loss_decreases_on_separable_data(spark, w):
    rng = np.random.default_rng(3)
    n = 200
    y = rng.integers(0, 2, size=n)
    # separable: class signal injected into every head's features
    X_av = rng.standard_normal((n, 256)) + 3.0 * (2 * y - 1)[:, None]
    X_a = rng.standard_normal((n, 128)) + 3.0 * (2 * y - 1)[:, None]
    X_v = rng.standard_normal((n, 128)) + 3.0 * (2 * y - 1)[:, None]
    pdf = pd.DataFrame(
        {"av": list(X_av), "a": list(X_a), "v": list(X_v), "label": y.astype(int)}
    )
    feats = spark.createDataFrame(pdf)
    cur, losses = dict(w), []
    for _ in range(4):
        cur, loss, _n = train_heads_epoch(feats, cur, lr=0.5)
        losses.append(loss)
    assert losses == sorted(losses, reverse=True), losses
    assert losses[-1] < losses[0] * 0.9


def test_invalid_labels_rejected(spark, w):
    rng = np.random.default_rng(4)
    X_av, X_a, X_v, _y = _data(rng, 8)
    pdf = pd.DataFrame(
        {"av": list(X_av), "a": list(X_a), "v": list(X_v),
         "label": [0, 1, -1, 0, 1, 0, 1, 0]}
    )
    feats = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="labels must be 0/1"):
        train_heads_epoch(feats, w, lr=0.1)


def test_missing_head_params_fail_fast(spark, w):
    stripped = {k: v for k, v in w.items() if not k.startswith("lossA.")}
    rng = np.random.default_rng(5)
    X_av, X_a, X_v, y = _data(rng, 4)
    pdf = pd.DataFrame(
        {"av": list(X_av), "a": list(X_a), "v": list(X_v), "label": y.astype(int)}
    )
    feats = spark.createDataFrame(pdf)
    with pytest.raises(KeyError, match="missing head params"):
        train_heads_epoch(feats, stripped, lr=0.1)
