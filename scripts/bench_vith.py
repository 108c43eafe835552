"""ViT-H/14 3D MAE pretrain step on one chip — the scaling data point.

The reference registry ships mae_vit_huge_patch14 (Pre-training/
models_mae_joint_res_flash_attn.py:829-843) but never trains it (largest
released model is ViT-L).  This bench shows the TPU framework takes the
next model size on a single 16GB v5e: ViT-H/14 (32x1280, ~630M params),
60-frame volumes at 224^2 (patch 14 -> the same 5121-token decoder
sequence as ViT-L at 256^2/16).

Knobs: VH_BATCH (default 4), VH_REMAT=1 (default off; the 3D-only step
fits no-remat at small batch), VH_DEC_HEADS (default 4 TPU-native — the
per-geometry story is established on ViT-L; 16 for parity),
VH_ENC_HEADS (default 16: 1280/16 = head_dim 80 — NOT 128-divisible, so
the parity partition falls back to the [B,H,N,D] kernel path; 10 heads
-> head_dim 128 is the TPU-native repartition that restores the packed
path).

Per the verify skill: fori_loop-chained steps, one host read.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("VH_BATCH", "4"))
REMAT = os.environ.get("VH_REMAT", "0") == "1"
DEC_HEADS = int(os.environ.get("VH_DEC_HEADS", "4"))
ENC_HEADS = int(os.environ.get("VH_ENC_HEADS", "16"))
FRAMES, IMG, PATCH, TPATCH = 60, 224, 14, 3
MASK_RATIO = 0.90
STEPS = int(os.environ.get("VH_STEPS", "8"))
V5E_PEAK_BF16 = 197e12


def train_step_flops_per_volume() -> float:
    d, layers = 1280, 32
    dd, dlayers = 512, 8
    l_full = (FRAMES // TPATCH) * (IMG // PATCH) ** 2     # 5120
    l_vis = int(l_full * (1 - MASK_RATIO)) + 1            # 513
    l_dec = l_full + 1

    def lin(n, dim):
        return 2 * n * 12 * dim * dim

    def attn(n, dim):
        return 2 * 2 * n * n * dim

    dense = (layers * lin(l_vis, d) + dlayers * lin(l_dec, dd)
             + 2 * l_full * (TPATCH * PATCH * PATCH) * d
             + 2 * l_dec * dd * (TPATCH * PATCH * PATCH)
             + 2 * l_dec * d * dd)
    a = layers * attn(l_vis, d) + dlayers * attn(l_dec, dd)
    return 3.0 * (dense + a)


def main():
    from octcubem_tpu.models import mae3d
    from octcubem_tpu.train import optim, schedules
    from octcubem_tpu.train.train_state import TrainState
    from octcubem_tpu.train.mae_engine import make_mae_train_step

    model = mae3d.mae_vit_huge_patch14(
        num_frames=FRAMES, t_patch_size=TPATCH, pred_t_dim=FRAMES,
        input_size=IMG, high_res_input_size=2 * IMG, in_chans=1,
        dtype=jnp.bfloat16, attn_impl="auto", remat=REMAT,
        num_heads=ENC_HEADS, decoder_num_heads=DEC_HEADS)
    x = jax.random.normal(jax.random.key(0), (BATCH, FRAMES, IMG, IMG, 1),
                          jnp.float32)
    params = jax.jit(
        lambda k, x: model.init({"params": k, "masking": k}, x,
                                mask_ratio=MASK_RATIO))(jax.random.key(1), x)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    sched = schedules.warmup_half_cosine(1.6e-3, 0.0, 1, 50, 1000)
    tx = optim.build_adamw(params, sched, weight_decay=0.05)
    state = TrainState.create(params, tx, jax.random.key(2))
    step = make_mae_train_step(model, tx, joint=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_steps(state, x):
        def body(i, st):
            st, _ = step(st, x, mask_ratio=MASK_RATIO)
            return st
        return jax.lax.fori_loop(0, STEPS, body, state)

    state = run_steps(state, x)
    _ = float(jax.tree.leaves(state.params)[0].sum())
    t0 = time.time()
    state = run_steps(state, x)
    _ = float(jax.tree.leaves(state.params)[0].sum())
    dt = time.time() - t0
    step_ms = dt / STEPS * 1000
    vps = BATCH / (dt / STEPS)
    flops = train_step_flops_per_volume()
    result = {
        "metric": "MAE ViT-H/14 3D pretrain step (60x224x224, mask 0.9)",
        "value": round(vps, 3), "unit": "volumes/sec/chip",
        "step_time_ms": round(step_ms, 1), "batch": BATCH, "remat": REMAT,
        "encoder_num_heads": ENC_HEADS, "decoder_num_heads": DEC_HEADS,
        "params_M": round(n_params / 1e6, 1),
        "flops_per_volume_T": round(flops / 1e12, 3),
        "mfu": round(flops * vps / V5E_PEAK_BF16, 4),
    }
    print(json.dumps(result), flush=True)
    # live extras ledger for bench.py (docs/perf/recorded.json)
    from octcubem_tpu.utils.recorded import record
    record(f"vith_enc{ENC_HEADS}_dec{DEC_HEADS}",
           dict(result, vol_s=result["value"],
                source="scripts/bench_vith.py"))


if __name__ == "__main__":
    main()
