"""Fine-tune losses: the reference's full dispatch battery in pure JAX.

Parity targets:
- WeightedLabelSmoothingCrossEntropy (OCTCube/util/
  WeightedLabelSmoothingCrossEntropy.py): label-smoothed NLL with rows whose
  one-hot target is all-zero masked out; mean over valid rows.
- multi_task_loss + multi_label_target_to_multi_task_target
  (OCTCube/engine_finetune.py:36-70): per-disease (normal, disease) pairs
  with per-sample validity, summed then divided by total valid weight
  (the reference's double normalization is reproduced as-is).
- BCE-with-logits (multi_label), CE (multi_class), MSE (regression),
  FocalLoss2d option (OCTCube/util/focal_loss.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_label_smoothing_ce(logits, target_onehot, smoothing: float = 0.1):
    """logits [B, C]; target_onehot [B, C] (possibly all-zero = invalid row)."""
    valid = (target_onehot.sum(axis=-1) != 0).astype(jnp.float32)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    idx = jnp.argmax(target_onehot, axis=-1)
    nll = -jnp.take_along_axis(logprobs, idx[:, None], axis=-1)[:, 0]
    smooth = -logprobs.mean(axis=-1)
    loss = (1.0 - smoothing) * nll + smoothing * smooth
    denom = valid.sum()
    return jnp.where(denom == 0, 0.0, (loss * valid).sum() / jnp.maximum(denom, 1.0))


def multi_task_targets(target):
    """[B, C] multi-label (col 0 = normal) -> ([B, C-1, 2] one-hots,
    [B, C-1] validity weights). Reference engine_finetune.py:36-44."""
    normal = target[:, 0:1]
    disease = target[:, 1:]
    t = jnp.stack([jnp.broadcast_to(normal, disease.shape), disease], axis=-1)
    w = t.sum(axis=-1)
    return t, w


def multi_task_loss(logits, target, smoothing: float = 0.1):
    """logits [B, 2*(C-1)]; target [B, C] multi-label with normal col 0."""
    t, w = multi_task_targets(target)
    ntask = t.shape[1]
    out = logits.reshape(logits.shape[0], ntask, 2)
    per_task = jax.vmap(
        lambda o, tt: weighted_label_smoothing_ce(o, tt, smoothing),
        in_axes=(1, 1))(out, t.astype(jnp.float32))
    return per_task.sum() / (w.sum() + 1e-8)


def bce_with_logits(logits, target):
    """Mean BCE-with-logits (multi_label mode)."""
    t = target.astype(jnp.float32)
    x = logits.astype(jnp.float32)
    return jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))


def softmax_ce(logits, labels, smoothing: float = 0.0):
    """Multi-class CE with integer labels, optional label smoothing."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    n = logits.shape[-1]
    nll = -jnp.take_along_axis(logprobs, labels[:, None], axis=-1)[:, 0]
    if smoothing > 0:
        smooth = -logprobs.mean(axis=-1)
        nll = (1 - smoothing) * nll + smoothing * smooth
    return nll.mean()


def mse_loss(pred, target):
    return jnp.mean((pred.astype(jnp.float32).squeeze()
                     - target.astype(jnp.float32).squeeze()) ** 2)


def focal_bce(logits, target, gamma: float = 2.0, balance: float = 0.25):
    """FocalLoss2d parity (OCTCube/util/focal_loss.py:18-37): binary focal
    over disease columns, plain BCE on the normal column, combined."""
    x = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    logpt = -(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))
    pt = jnp.exp(logpt[:, 1:])
    focal = -((1 - pt) ** gamma) * logpt[:, 1:]
    c = x.shape[1]
    return jnp.mean(
        (balance * focal.mean() * (c - 1) - logpt[:, 0]) / c)


def make_criterion(task_mode: str, *, smoothing: float = 0.1,
                   use_focal: bool = False):
    """Loss dispatch mirroring engine_finetune.py:423-441."""
    if task_mode.startswith("multi_task"):
        return lambda o, t: multi_task_loss(o, t, smoothing)
    if task_mode == "multi_label":
        if use_focal:
            return focal_bce
        return bce_with_logits
    if task_mode == "regression":
        return mse_loss
    # multi_cls / binary_cls
    return lambda o, t: softmax_ce(o, t, smoothing)
