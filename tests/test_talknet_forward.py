"""M3 real-forward tests: the numpy TalkNet implementation
(operators/talknet_forward.py) — primitive kernels pinned against naive
reference loops, end-to-end forward shape/determinism, and the Spark
``score_tracks`` shell driving the real forward with feature columns.

No torch exists in this container, so parity with the reference's
learned weights cannot be asserted; what IS asserted is that every
primitive matches its mathematical definition and that the
architecture wiring (shapes, stride plan, 100 Hz -> 25 fps collapse)
matches the reference layer list (model/talkNetModel.py,
audioEncoder.py, visualEncoder.py, attentionLayer.py, loss.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from talknet_segmentation_batchprocessing_spark.operators import talknet_forward as tf


def naive_conv2d(x, w, stride, pad):
    sh, sw = stride
    B, C, H, W = x.shape
    O, _, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    Ho = (xp.shape[2] - kh) // sh + 1
    Wo = (xp.shape[3] - kw) // sw + 1
    out = np.zeros((B, O, Ho, Wo))
    for b in range(B):
        for o in range(O):
            for i in range(Ho):
                for j in range(Wo):
                    patch = xp[b, :, i * sh : i * sh + kh, j * sw : j * sw + kw]
                    out[b, o, i, j] = (patch * w[o]).sum()
    return out


def test_conv2d_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 9, 11))
    w = rng.standard_normal((4, 3, 3, 3))
    for stride, pad in [((1, 1), 1), ((2, 2), 1), ((2, 1), 0)]:
        got = tf.conv2d(x, w, stride=stride, pad=pad)
        want = naive_conv2d(x, w, stride, pad) if pad else naive_conv2d(x, w, stride, 0)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_conv3d_matches_naive():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2, 4, 6, 6))
    w = rng.standard_normal((3, 2, 3, 3, 3))
    got = tf.conv3d(x, w, stride=(1, 2, 2), pad=(1, 1, 1))
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
    Do, Ho, Wo = got.shape[2:]
    want = np.zeros_like(got)
    for o in range(3):
        for d in range(Do):
            for i in range(Ho):
                for j in range(Wo):
                    patch = xp[0, :, d : d + 3, i * 2 : i * 2 + 3, j * 2 : j * 2 + 3]
                    want[0, o, d, i, j] = (patch * w[o]).sum()
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_depthwise_conv1d_matches_naive():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 5, 8))
    w = rng.standard_normal((5, 1, 3))
    got = tf.conv1d(x, w, pad=1, groups=5)
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1)))
    want = np.zeros((1, 5, 8))
    for c in range(5):
        for t in range(8):
            want[0, c, t] = (xp[0, c, t : t + 3] * w[c, 0]).sum()
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_maxpool_and_avgpool():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 2, 3, 6, 6))
    got = tf.maxpool3d(x)  # k(1,3,3) s(1,2,2) p(0,1,1)
    assert got.shape == (1, 2, 3, 3, 3)
    # corner window of the padded input
    assert got[0, 0, 0, 0, 0] == x[0, 0, 0, :2, :2].max()
    a = rng.standard_normal((1, 1, 4, 4))
    np.testing.assert_allclose(tf.avgpool2d(a, (4, 4))[0, 0, 0, 0], a.mean())


def test_batchnorm_layernorm_semantics():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 5))
    g, b = np.array([1.0, 2.0, 3.0]), np.array([0.5, 0.0, -0.5])
    mean, var = np.zeros(3), np.ones(3)
    got = tf.batchnorm(x, g, b, mean, var, eps=0.0)
    np.testing.assert_allclose(got, x * g.reshape(1, 3, 1) + b.reshape(1, 3, 1))
    y = rng.standard_normal((4, 8))
    ln = tf.layer_norm(y, np.ones(8), np.zeros(8))
    np.testing.assert_allclose(ln.mean(axis=-1), 0.0, atol=1e-12)
    np.testing.assert_allclose(ln.std(axis=-1), 1.0, atol=1e-3)


def test_multihead_attention_properties():
    rng = np.random.default_rng(5)
    d, nh, T = 16, 4, 6
    wqkv = rng.standard_normal((3 * d, d)) * 0.2
    bqkv = np.zeros(3 * d)
    wo = np.eye(d)
    bo = np.zeros(d)
    x = rng.standard_normal((T, d))
    out = tf.multihead_attention(x, x, x, wqkv, bqkv, wo, bo, nh)
    assert out.shape == (T, d)
    # identical keys/values for every query -> every output row equal
    same = np.tile(x[:1], (T, 1))
    out2 = tf.multihead_attention(x, same, same, wqkv, bqkv, wo, bo, nh)
    v_proj = same @ wqkv[2 * d :].T
    np.testing.assert_allclose(out2, np.tile(v_proj[:1], (T, 1)), atol=1e-10)


def test_audio_frontend_time_resample():
    """100 Hz MFCC in, 25 Hz embeddings out — the two stride-2 layers
    (audioEncoder.py:64-66) are the 4x time collapse."""
    w = tf.init_weights(seed=1)
    out = tf.forward_audio_frontend(w, np.random.default_rng(0).standard_normal((40, 13)))
    assert out.shape == (10, 128)
    assert np.isfinite(out).all()


def test_visual_frontend_shape():
    w = tf.init_weights(seed=1)
    frames = np.random.default_rng(1).integers(0, 256, size=(3, 112, 112))
    out = tf.forward_visual_frontend(w, frames)
    assert out.shape == (3, 128)
    assert np.isfinite(out).all()


def test_talknet_forward_end_to_end_deterministic():
    w = tf.init_weights(seed=7)
    rng = np.random.default_rng(2)
    mfcc = rng.standard_normal((12, 13))
    frames = rng.integers(0, 256, size=(3, 112, 112))
    s1 = tf.talknet_forward(w, mfcc, frames)
    s2 = tf.talknet_forward(w, mfcc, frames)
    assert s1.shape == (3,)
    np.testing.assert_array_equal(s1, s2)
    assert np.isfinite(s1).all()
    # different inputs move the score
    s3 = tf.talknet_forward(w, mfcc + 1.0, frames)
    assert not np.allclose(s1, s3)


def test_state_dict_names_are_torch_shaped():
    """Checkpoint-parity contract (M4, talkNet.py:130-147): keys follow
    torch state_dict naming so an exported checkpoint drops in."""
    w = tf.init_weights()
    for probe in [
        "audioEncoder.conv1.weight",
        "audioEncoder.layer2.0.downsample.0.weight",
        "audioEncoder.layer1.2.se.fc.2.bias",
        "visualFrontend.frontend3D.0.weight",
        "visualFrontend.resnet.layer4.conv2b.weight",
        "visualTCN.net.4.net.2.weight",
        "visualConv1D.net.3.bias",
        "crossA2V.self_attn.in_proj_weight",
        "selfAV.linear2.weight",
        "lossAV.FC.weight",
    ]:
        assert probe in w, probe
    # audio SE-ResNet34 block count: 3+4+6+3
    n_blocks = len({k.split(".")[2] for k in w if k.startswith("audioEncoder.layer")})
    assert sum(1 for k in w if ".se.fc.0.weight" in k) == 3 + 4 + 6 + 3


def test_score_tracks_with_real_forward(spark):
    """The Spark M3 shell end-to-end with the REAL forward: feature
    columns in, per-frame rounded ensemble scores out."""
    import pandas as pd

    from talknet_segmentation_batchprocessing_spark.operators.inference import (
        score_tracks,
    )
    from talknet_segmentation_batchprocessing_spark.operators.talknet_forward import (
        talknet_scorer,
    )

    rng = np.random.default_rng(9)
    rows = []
    for f in range(10):
        rows.append(
            {
                "video_id": "vid0",
                "track_id": 0,
                "frame_idx": f,
                "mfcc": rng.standard_normal(4 * 13).tolist(),
                "face": rng.integers(0, 256, size=112 * 112).astype(float).tolist(),
            }
        )
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = score_tracks(
        df, model_builder=lambda _state: talknet_scorer(seed=3), durations=[1]
    ).toPandas()
    assert len(out) == 10
    assert sorted(out.frame_idx) == list(range(10))
    assert np.isfinite(out.score).all()
    # rounded to 1 decimal (X14)
    assert all(abs(v * 10 - round(v * 10)) < 1e-9 for v in out.score)
    out2 = score_tracks(
        df, model_builder=lambda _state: talknet_scorer(seed=3), durations=[1]
    ).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("frame_idx").reset_index(drop=True),
        out2.sort_values("frame_idx").reset_index(drop=True),
    )


def test_broadcast_weights_roundtrip(spark):
    """M4 with the real model: pickled state_dict broadcast once,
    deserialized per executor (talkNet.py:130-147 checkpoint load ->
    broadcast), scores identical to a locally-built scorer."""
    import pickle

    import pandas as pd

    from talknet_segmentation_batchprocessing_spark.operators.inference import (
        broadcast_weights,
        score_tracks,
    )
    from talknet_segmentation_batchprocessing_spark.operators.talknet_forward import (
        talknet_scorer,
    )

    rng = np.random.default_rng(21)
    rows = [
        {
            "video_id": "v",
            "track_id": 0,
            "frame_idx": f,
            "mfcc": rng.standard_normal(52).tolist(),
            "face": rng.integers(0, 256, size=112 * 112).astype(float).tolist(),
        }
        for f in range(6)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    state = pickle.dumps(tf.init_weights(seed=5))
    bc = broadcast_weights(spark, state)
    via_bc = score_tracks(
        df,
        model_bc=bc,
        model_builder=lambda s: talknet_scorer(weights=pickle.loads(s)),
        durations=[1],
    ).toPandas()
    local = score_tracks(
        df, model_builder=lambda _s: talknet_scorer(seed=5), durations=[1]
    ).toPandas()
    pd.testing.assert_frame_equal(
        via_bc.sort_values("frame_idx").reset_index(drop=True),
        local.sort_values("frame_idx").reset_index(drop=True),
    )
