"""Headline benchmark: ViT-L 3D MAE pretraining throughput on one TPU chip.

Config mirrors the reference pretrain script (SURVEY §6 / BASELINE.md):
ViT-L/16 3D MAE, 60x256x256 grayscale volumes, t_patch 3, mask ratio 0.90,
full train step (fwd + bwd + AdamW update), bf16 activations / fp32 params,
Pallas flash attention.

Prints ONE JSON line:
  {"metric": "...", "value": vol/s/chip, "unit": "volumes/sec/chip",
   "vs_baseline": value / A100_EST, ...extras}

vs_baseline: the reference publishes no numbers (BASELINE.md), so the bar
is an analytic A100 estimate: same train-step FLOPs at 35% MFU of A100
fp16 peak (312 TFLOPs) — a deliberately strong stand-in for the
flash-attn fp16 DDP reference.  >1.0 means exceeding that estimate.

Timing note: jax.block_until_ready does not sync through the axon relay
(see .claude/skills/verify/SKILL.md), so steps are chained on device with
lax.fori_loop and a single host read closes the timing window.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: survives backend restarts / chip recoveries
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
REMAT = os.environ.get("BENCH_REMAT", "0") == "1"
# BENCH_MESH=1: shard the batch over ALL local devices (batch scales with
# device count; vol/s reported per chip). Off by default to keep the
# proven single-chip graph/compile-cache.
USE_MESH = os.environ.get("BENCH_MESH", "0") == "1"
FRAMES, IMG, PATCH, TPATCH = 60, 256, 16, 3
MASK_RATIO = 0.90
STEPS = 8
V5E_PEAK_BF16 = 197e12
A100_PEAK_FP16 = 312e12
A100_ASSUMED_MFU = 0.35


def train_step_flops_per_volume() -> float:
    """Analytic FLOPs (fwd+bwd ~= 3x fwd) of one MAE train step, per volume."""
    d, layers, heads = 1024, 24, 16
    dd, dlayers = 512, 8
    l_full = (FRAMES // TPATCH) * (IMG // PATCH) ** 2     # 5120
    l_vis = int(l_full * (1 - MASK_RATIO)) + 1            # 513 (cls)
    l_dec = l_full + 1

    def block_flops(n, dim):
        lin = 2 * n * 12 * dim * dim          # qkvo + mlp matmuls
        attn = 2 * 2 * n * n * dim            # qk^T and pv
        return lin + attn

    enc = layers * block_flops(l_vis, d)
    dec = dlayers * block_flops(l_dec, dd)
    patch = 2 * l_full * (TPATCH * PATCH * PATCH) * d      # patch embed
    pred = 2 * l_dec * dd * (TPATCH * PATCH * PATCH)       # decoder_pred
    emb = 2 * l_dec * d * dd                               # decoder_embed
    fwd = enc + dec + patch + pred + emb
    return 3.0 * fwd


def main():
    from octcubem_tpu.models import mae3d
    from octcubem_tpu.train import optim, schedules
    from octcubem_tpu.train.train_state import TrainState
    from octcubem_tpu.train.mae_engine import make_mae_train_step

    model = mae3d.flash_attn_mae_vit_large_patch16(
        num_frames=FRAMES, t_patch_size=TPATCH, pred_t_dim=FRAMES,
        input_size=IMG, high_res_input_size=512, in_chans=1,
        dtype=jnp.bfloat16, attn_impl="auto", remat=REMAT,
    )
    x = jax.random.normal(jax.random.key(0), (BATCH, FRAMES, IMG, IMG, 1),
                          jnp.float32)
    params = jax.jit(
        lambda k, x: model.init({"params": k, "masking": k}, x,
                                mask_ratio=MASK_RATIO)
    )(jax.random.key(1), x)
    sched = schedules.warmup_half_cosine(1.6e-3, 0.0, 1, 50, 1000)
    # BENCH_MU=bf16 stores the Adam first moment in bf16 (halves mu HBM
    # traffic in the update step); default fp32 = reference semantics
    mu = jnp.bfloat16 if os.environ.get("BENCH_MU") == "bf16" else None
    tx = optim.build_adamw(params, sched, weight_decay=0.05, mu_dtype=mu)
    state = TrainState.create(params, tx, jax.random.key(2))

    step = make_mae_train_step(model, tx, joint=False)

    if USE_MESH:
        from octcubem_tpu.core import mesh as meshlib
        from octcubem_tpu.train.mae_engine import shard_batch, replicate_state

        mesh = meshlib.make_mesh()
        n_dev = mesh.shape[meshlib.DATA_AXIS]
        x = jax.random.normal(jax.random.key(0),
                              (BATCH * n_dev, FRAMES, IMG, IMG, 1),
                              jnp.float32)
        x = shard_batch(x, mesh)
        state = replicate_state(state, mesh)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_steps(state, x):
        def body(i, st):
            st, _ = step(st, x, mask_ratio=MASK_RATIO)
            return st
        return jax.lax.fori_loop(0, STEPS, body, state)

    # warmup / compile
    state = run_steps(state, x)
    _ = float(jax.tree.leaves(state.params)[0].sum())  # force sync

    t0 = time.time()
    state = run_steps(state, x)
    _ = float(jax.tree.leaves(state.params)[0].sum())
    dt = time.time() - t0

    step_time = dt / STEPS
    vols_per_sec = BATCH / step_time
    flops_per_vol = train_step_flops_per_volume()
    mfu = flops_per_vol * vols_per_sec / V5E_PEAK_BF16
    a100_est = A100_PEAK_FP16 * A100_ASSUMED_MFU / flops_per_vol

    print(json.dumps({
        "metric": "MAE ViT-L 3D pretrain throughput (60x256x256, mask 0.9)",
        "value": round(vols_per_sec, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vols_per_sec / a100_est, 3),
        "step_time_ms": round(step_time * 1000, 1),
        "batch": BATCH,
        "remat": REMAT,
        "mfu": round(mfu, 4),
        "flops_per_volume_T": round(flops_per_vol / 1e12, 3),
        "baseline_note": "A100 est = 35% MFU of 312 TF fp16 on same FLOPs",
        # why the >=40% MFU target is unreachable at parity (measured,
        # NOTES_ROUND2.md): the decoder's head_dim-32 attention is MXU
        # output-rate bound — qk^T/pv use 32 of 128 contraction lanes and
        # the [N,N] score-element production rate binds, capping those
        # matmuls at <20% of peak BY CONSTRUCTION. Measured perfect-step
        # floor (attention at its hardware floor + linears at peak + AdamW
        # HBM traffic) ~224ms -> ~28% MFU ceiling at batch 4. 40% would
        # need head_dim >=128 or approximate attention — parity breaks.
        "mfu_ceiling_note": "~28% at batch 4: head_dim-32 decoder "
                            "attention is MXU output-rate bound "
                            "(NOTES_ROUND2.md)",
    }))


if __name__ == "__main__":
    main()
