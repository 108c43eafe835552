"""LR schedules.

Parity targets: OCTCube/util/lr_sched.py:9-27 (per-iteration half-cosine
with linear warmup over fractional epochs) and retinal-COEM
training/scheduler.py (per-step cosine with warmup).  Both are expressed
as step-indexed optax schedules.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_half_cosine(base_lr: float, min_lr: float, warmup_epochs: float,
                       total_epochs: float, steps_per_epoch: int):
    """Reference MAE schedule: lr(epoch) with epoch = step / steps_per_epoch.

    Linear warmup from 0 to base_lr over warmup_epochs; then
    min_lr + (base_lr - min_lr) * 0.5 * (1 + cos(pi * progress)).
    """

    def schedule(step):
        epoch = step / steps_per_epoch
        warm = base_lr * epoch / max(warmup_epochs, 1e-8)
        progress = (epoch - warmup_epochs) / max(total_epochs - warmup_epochs, 1e-8)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def clip_cosine_lr(base_lr: float, warmup_steps: int, total_steps: int):
    """retinal-COEM cosine_lr: linear warmup by steps then plain cosine to 0
    (training/scheduler.py:1-22)."""

    def schedule(step):
        warm = base_lr * (step + 1) / max(warmup_steps, 1)
        e = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e)) * base_lr
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def scale_base_lr(blr: float, eff_batch_size: int) -> float:
    """Reference linear scaling rule: lr = blr * eff_batch / 256
    (main_pretrain_oph_joint_2d512_flash_attn.py and all finetune mains)."""
    return blr * eff_batch_size / 256.0


def spl_k_schedule(epoch: float, k_max=0.7, k_min=0.3, total_epochs=100,
                   warmup_epochs=10, epoch_offset=0) -> float:
    """Self-paced-learning top-K fraction schedule (main_pretrain…py:53-59):
    hold K_max during warmup, then linear decay toward K_min."""
    e = epoch - epoch_offset
    if e <= warmup_epochs:
        return k_max
    return k_max - (e - warmup_epochs) * (k_max - k_min) / (
        total_epochs - warmup_epochs - epoch_offset)


def mask_ratio_2d_schedule(epoch: float, ratio_min=0.75, ratio_max=0.85,
                           total_epochs=100, warmup_epochs=10,
                           epoch_offset=0) -> float:
    """2D-branch mask-ratio ramp (main_pretrain…py:61-67)."""
    e = epoch - epoch_offset
    if e <= warmup_epochs:
        return ratio_min
    return ratio_min + (e - warmup_epochs) * (ratio_max - ratio_min) / (
        total_epochs - warmup_epochs - epoch_offset)
