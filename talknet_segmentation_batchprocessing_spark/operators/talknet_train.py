"""M5: TalkNet loss-head training as a Spark-native data-parallel
step (reference talkNet.py:44-86 train_network + loss.py lossAV/
lossA/lossV).

Scope, stated honestly: the reference backpropagates through the full
audio/visual trunks with torch autograd; a full-network numpy autograd
adds nothing Spark-relevant, and production fine-tuning of the trunks
rides TorchDistributor (SURVEY §2.8 note). What IS Spark-shaped — and
implemented for real here — is the data-parallel step for the three
classifier heads on frozen-trunk embeddings (the standard last-layer
fine-tune): closed-form cross-entropy gradients computed executor-side
per Arrow batch, summed with ONE tiny aggregation (the allreduce), and
applied on the driver. Because the mean-CE gradient is linear in
samples, the distributed epoch equals the local full-batch step
EXACTLY (up to float summation order) — pinned by tests.

Heads (loss.py): lossAV = FC(256,2), lossA = FC(128,2),
lossV = FC(128,2); combined loss = AV + 0.4*A + 0.4*V
(talkNet.py:67). Weight keys match the torch state_dict
(``lossAV.FC.weight`` etc.), shared with talknet_forward.init_weights.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .talknet_forward import softmax

HEADS = (("lossAV.FC", 256, 1.0), ("lossA.FC", 128, 0.4), ("lossV.FC", 128, 0.4))


def _head_loss_grads(w, prefix, X, y, scale):
    """Mean cross-entropy + closed-form grads for one linear head:
    Z = X W^T + b, p = softmax(Z), dZ = (p - onehot)/n,
    dW = dZ^T X, db = sum(dZ). Returns (scaled loss, dW, db)."""
    W, b = w[f"{prefix}.weight"], w[f"{prefix}.bias"]
    n = len(y)
    Z = X @ W.T + b
    p = softmax(Z, axis=-1)
    # log-sum-exp form for the loss (stable, matches torch CE)
    zmax = Z.max(axis=1, keepdims=True)
    lse = zmax[:, 0] + np.log(np.exp(Z - zmax).sum(axis=1))
    loss = float((lse - Z[np.arange(n), y]).mean())
    dZ = p.copy()
    dZ[np.arange(n), y] -= 1.0
    dZ /= n
    return scale * loss, scale * (dZ.T @ X), scale * dZ.sum(axis=0)


def loss_and_grads(w, X_av, X_a, X_v, y):
    """Combined loss AV + 0.4*A + 0.4*V (talkNet.py:67) and gradients
    for all six head parameters. Returns (loss, {param: grad})."""
    total = 0.0
    grads = {}
    for (prefix, _dim, scale), X in zip(HEADS, (X_av, X_a, X_v)):
        li, dW, db = _head_loss_grads(w, prefix, X, y, scale)
        total += li
        grads[f"{prefix}.weight"] = dW
        grads[f"{prefix}.bias"] = db
    return total, grads


def _flatten(grads):
    return np.concatenate([grads[k].ravel() for k in _PARAM_KEYS])


_PARAM_KEYS = [f"{p}.{s}" for p, _d, _s in HEADS for s in ("weight", "bias")]
_PARAM_SHAPES = {
    f"{p}.weight": (2, d) for p, d, _s in HEADS
} | {f"{p}.bias": (2,) for p, _d, _s in HEADS}
_FLAT_DIM = sum(int(np.prod(_PARAM_SHAPES[k])) for k in _PARAM_KEYS)


def _unflatten(flat):
    out, off = {}, 0
    for k in _PARAM_KEYS:
        size = int(np.prod(_PARAM_SHAPES[k]))
        out[k] = flat[off : off + size].reshape(_PARAM_SHAPES[k])
        off += size
    return out


def _epoch_mean_grad(feats: DataFrame, wb: dict):
    """The distributed allreduce shared by every optimizer: executors
    emit one (n, n*loss, n*flat_grad) payload VECTOR per Arrow batch as
    2+_FLAT_DIM=1032 (idx, val) rows, so the shuffle is
    #batches x 1032 tiny rows (~8 KB per batch) regardless of corpus
    size; one groupBy(idx).sum aggregation sums the payloads. Mean-CE
    is linear in samples, so the result equals the local full-batch
    (loss, grad) EXACTLY (up to float summation order).

    Returns (n_total, mean_loss, mean_flat_grad | None).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            nulls = pdf[["av", "a", "v", "label"]].isna()
            if nulls.to_numpy().any():
                # NaN labels would cast to INT64_MIN (an opaque "got
                # [-9223372036854775808]" error) and null arrays would
                # crash np.vstack inside the task — name the problem
                bad_cols = [c for c in nulls.columns if nulls[c].any()]
                raise ValueError(
                    f"null values in training columns {bad_cols} — "
                    "drop or impute nulls before training"
                )
            X_av = np.vstack(pdf["av"].to_numpy())
            X_a = np.vstack(pdf["a"].to_numpy())
            X_v = np.vstack(pdf["v"].to_numpy())
            y = pdf["label"].to_numpy(dtype=np.int64)
            if ((y < 0) | (y > 1)).any():
                # -1 'ambiguous' labels would silently wrap to class 1
                # via negative indexing — reject instead
                bad = np.unique(y[(y < 0) | (y > 1)])
                raise ValueError(
                    f"labels must be 0/1; got {bad.tolist()} — filter "
                    "ambiguous (-1) rows before training"
                )
            loss, grads = loss_and_grads(wb, X_av, X_a, X_v, y)
            n = len(y)
            payload = np.concatenate([[float(n), n * loss], n * _flatten(grads)])
            yield pd.DataFrame({"idx": range(len(payload)), "val": payload})

    parts = feats.select("av", "a", "v", "label").mapInPandas(
        fn, "idx int, val double"
    )
    # the allreduce: elementwise sum over per-batch payload vectors
    summed = parts.groupBy("idx").agg(F.sum("val").alias("s")).collect()
    acc = np.zeros(2 + _FLAT_DIM)
    for r in summed:
        acc[r["idx"]] = r["s"]
    n_total = acc[0]
    if n_total == 0:
        return 0, float("nan"), None
    return int(n_total), float(acc[1] / n_total), acc[2:] / n_total


def _check_head_params(w: dict) -> dict:
    missing = [k for k in _PARAM_KEYS if k not in w]
    if missing:
        # fail fast on the driver, not as a KeyError inside a task: a
        # stripped inference checkpoint commonly lacks lossA/lossV
        raise KeyError(f"weights dict is missing head params: {missing}")
    return {k: np.asarray(w[k], dtype=np.float64) for k in _PARAM_KEYS}


def train_heads_epoch(feats: DataFrame, w: dict, lr: float = 1e-4):
    """One exact full-batch SGD step, distributed.

    ``feats`` columns: ``av`` array<double>[256], ``a`` / ``v``
    array<double>[128], ``label`` int (0/1; validated, nulls rejected).
    One :func:`_epoch_mean_grad` allreduce, then the driver applies
    ``w - lr * grad``; equals the local full-batch step exactly.

    Returns (new_weights, mean_loss, n_samples). For the reference's
    actual optimizer (Adam + StepLR) see :func:`train_heads_adam`.
    """
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(feats)
    wb = _check_head_params(w)
    n_total, mean_loss, flat = _epoch_mean_grad(feats, wb)
    if n_total == 0:
        return dict(w), mean_loss, 0
    grad = _unflatten(flat)
    new_w = dict(w)
    for k in _PARAM_KEYS:
        new_w[k] = wb[k] - lr * grad[k]
    return new_w, mean_loss, n_total


class AdamState:
    """Driver-side Adam moment state over the FLAT head-parameter
    vector — a few KB, so it lives on the driver like the reference's
    optimizer object lives on the GPU host (talkNet.py:29-33). The
    gradient it consumes is the exact distributed full-batch mean, so
    the trajectory equals torch.optim.Adam on the same local batch."""

    def __init__(self, betas=(0.9, 0.999), eps: float = 1e-8):
        self.betas = betas
        self.eps = eps
        self.t = 0
        self.m = np.zeros(_FLAT_DIM)
        self.v = np.zeros(_FLAT_DIM)

    def step(self, flat_grad: np.ndarray, lr: float) -> np.ndarray:
        """One torch-semantics Adam update; returns the flat delta to
        ADD to the parameters."""
        b1, b2 = self.betas
        self.t += 1
        self.m = b1 * self.m + (1.0 - b1) * flat_grad
        self.v = b2 * self.v + (1.0 - b2) * flat_grad * flat_grad
        m_hat = self.m / (1.0 - b1**self.t)
        v_hat = self.v / (1.0 - b2**self.t)
        return -lr * m_hat / (np.sqrt(v_hat) + self.eps)


def train_heads_adam(
    feats: DataFrame,
    w: dict,
    epochs: int = 1,
    lr: float = 1e-4,
    lr_decay: float = 0.95,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    state: AdamState | None = None,
):
    """Reference-parity optimizer loop: Adam + per-epoch StepLR decay
    (talkNet.py:29-33 ``Adam(lr)`` + ``StepLR(step_size=1,
    gamma=0.95)``; trainTalkNet.py:70-83 steps the scheduler once per
    epoch, so epoch e trains at ``lr * lr_decay**(e-1)``).

    Each epoch is ONE :func:`_epoch_mean_grad` allreduce (full-batch
    Adam: the reference's per-minibatch loop is a GPU-memory
    concession, not a semantic choice — with frozen trunks the
    full-batch gradient is the exact descent direction); the moment
    vectors and lr schedule are driver-side scalars over the flat
    1030-dim parameter vector. Pass ``state`` to continue a previous
    run's moments (e.g. epoch-at-a-time orchestration).

    Returns (new_weights, per_epoch_losses, n_samples, state).
    """
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(feats)
    wb = _check_head_params(w)
    st = state or AdamState(betas=betas, eps=eps)
    flat_w = np.concatenate([wb[k].ravel() for k in _PARAM_KEYS])
    losses: list[float] = []
    n_total = 0
    # The upstream feats plan (typically the featurization join) is
    # scanned once PER EPOCH — persist so epochs 2..N read cached
    # partitions instead of recomputing the pipeline (review find).
    cached = feats.persist() if epochs > 1 else feats
    try:
        for _e in range(epochs):
            cur = _unflatten(flat_w)
            n_total, mean_loss, flat_grad = _epoch_mean_grad(cached, cur)
            if n_total == 0:
                losses.append(mean_loss)
                break
            losses.append(mean_loss)
            # StepLR(step_size=1): epoch's lr = base * gamma**(epochs
            # done so far) — st.t counts one step per epoch, so a
            # continued ``state`` keeps decaying instead of restarting
            # the schedule.
            flat_w = flat_w + st.step(flat_grad, lr * lr_decay**st.t)
    finally:
        if epochs > 1:
            cached.unpersist()
    new_w = dict(w)
    new_w.update(_unflatten(flat_w))
    return new_w, losses, n_total, st


def train_distributed(
    spark,
    feats: DataFrame,
    w: dict,
    epochs: int = 1,
    lr: float = 1e-4,
    lr_decay: float = 0.95,
    num_processes: int = 2,
    use_gpu: bool = False,
    full_network: bool = False,
):
    """M5 front door for FULL-network training: the Spark-idiomatic
    path for backpropagating through the audio/visual trunks is
    ``pyspark.ml.torch.distributor.TorchDistributor`` running the
    reference's own torch loop (talkNet.py:20-86 train_network with
    loss AV + 0.4*A + 0.4*V, Adam + StepLR(1, 0.95) —
    trainTalkNet.py:70-83) under DDP, one process per GPU, reading the
    featurized table as shards.

    The DEFAULT path is the exact frozen-trunk head trainer
    (:func:`train_heads_adam`, same loss heads, same optimizer
    schedule) regardless of whether torch is installed — the
    full-network DDP loop body is not yet ported (SURVEY.md M5 scopes
    it out of the core engine), so merely having torch on the image
    must not change what a default call computes. Passing
    ``full_network=True`` opts into the distributor wiring: it
    requires torch + ``pyspark.ml.torch.distributor`` (ImportError
    otherwise, naming the missing wheel) and currently raises
    NotImplementedError FROM INSIDE the distributor-launched process,
    proving the launch plumbing while being explicit that the DDP
    epoch body (talkNet.py:20-86 train_network) is the remaining
    port.

    Returns ``(new_weights, per_epoch_losses, n_samples, backend)``
    with ``backend`` in ``("torch-distributor", "heads-allreduce")``.
    """
    if not full_network:
        new_w, losses, n, _st = train_heads_adam(
            feats, w, epochs=epochs, lr=lr, lr_decay=lr_decay
        )
        return new_w, losses, n, "heads-allreduce"

    from pyspark.ml.torch.distributor import TorchDistributor

    # Torch present and full-network explicitly requested: ship the
    # featurized shards to a DDP train loop. The loop body is the
    # reference's train_network epoch; only data loading is
    # Spark-shaped (arrow batches -> tensors). Same embedding columns
    # the head trainer consumes.
    feat_rows = feats.select("av", "a", "v", "label")

    def _train_fn():  # pragma: no cover - requires torch at runtime
        raise NotImplementedError(
            "full-network DDP loop: port talkNet.py:20-86 train_network "
            "onto the collected shard iterator; out of scope for the "
            "torch-free engine image (SURVEY.md M5 note)"
        )

    distributor = TorchDistributor(
        num_processes=num_processes, local_mode=True, use_gpu=use_gpu
    )
    result = distributor.run(_train_fn)
    return result, [], feat_rows.count(), "torch-distributor"
