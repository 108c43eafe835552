"""Joint-pretrain benchmark: the reference's FULL headline config.

One train step = 3D volume batch (60x256x256, mask 0.90) + high-res 2D
batch (512^2, batch 64, mask 0.80) through the shared joint-res MAE with
one fused optimizer update — the workload of
Pre-training/scripts/run_chunks_pretraining_vitl_oph_joint_flash_attn.sh
(3D bsz 1/gpu x4 + 2D bsz 64/gpu; here one chip carries both).

BJ_PREMASK=1 additionally computes the blank-region pre-mask in-step
(the reference runs a separate forward_patch_embed pass per step).

Timing per the verify skill: fori_loop-chained steps, one host read.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH3D = int(os.environ.get("BJ_BATCH3D", "4"))
BATCH2D = int(os.environ.get("BJ_BATCH2D", "64"))
# BJ_MODEL=vith: the ViT-H/14 joint config (vith_mae_tpu_native preset —
# 224^2/448^2, the 14-divisible counterparts of 256^2/512^2; same 5121-
# token decoder sequence).  Default vitl = the reference headline config.
MODEL = os.environ.get("BJ_MODEL", "vitl")
if MODEL == "vith":
    FRAMES, IMG, IMG2D, PATCH, TPATCH = 60, 224, 448, 14, 3
    ENC_DIM, ENC_LAYERS = 1280, 32
else:
    FRAMES, IMG, IMG2D, PATCH, TPATCH = 60, 256, 512, 16, 3
    ENC_DIM, ENC_LAYERS = 1024, 24
MASK3D, MASK2D = 0.90, 0.80
STEPS = int(os.environ.get("BJ_STEPS", "8"))
PREMASK = os.environ.get("BJ_PREMASK", "0") == "1"
REMAT = os.environ.get("BJ_REMAT", "0") == "1"
# hybrid: remat ONLY the memory-heavy 2D 512^2 branch (mae_engine
# model2d); 3D side keeps the no-remat graph.  Default on — the full
# joint config OOMs on a 16GB v5e without at least the 2D side
# rematerialized (30.4GB demand, NOTES_ROUND3.md).
# 2D-branch-only grad accumulation: fits the joint config WITHOUT remat
# (mae_engine accum_2d) — microbatch peak memory replaces recompute
ACCUM2D = int(os.environ.get("BJ_ACCUM2D", "1"))
REMAT2D = (os.environ.get("BJ_REMAT2D", "1") == "1" and not REMAT
           and ACCUM2D == 1)
# BJ_DEC_HEADS: decoder head partitioning (16 = reference parity hd-32,
# 4 = vitl_mae_tpu_native hd-128 — same FLOPs/params, see bench.py and
# NOTES_ROUND4.md decoder-geometry ablation)
DEC_HEADS = int(os.environ.get("BJ_DEC_HEADS",
                                "4" if MODEL == "vith" else "16"))
# BJ_ENC_HEADS: encoder head partitioning (16 = parity hd-64, 8 =
# TPU-native hd-128; the 2D 512^2 branch runs the encoder over ~13k
# visible tokens, so encoder lane occupancy matters in the joint step)
ENC_HEADS = int(os.environ.get("BJ_ENC_HEADS",
                                "10" if MODEL == "vith" else "16"))


def main():
    from octcubem_tpu.models import mae3d
    from octcubem_tpu.train import optim, schedules
    from octcubem_tpu.train.train_state import TrainState
    from octcubem_tpu.train.mae_engine import make_mae_train_step

    kw = dict(num_frames=FRAMES, t_patch_size=TPATCH, pred_t_dim=FRAMES,
              input_size=IMG, high_res_input_size=IMG2D, in_chans=1,
              dtype=jnp.bfloat16, attn_impl="auto",
              num_heads=ENC_HEADS, decoder_num_heads=DEC_HEADS)
    ctor = (mae3d.mae_vit_huge_patch14 if MODEL == "vith"
            else mae3d.flash_attn_mae_vit_large_patch16)
    model = ctor(**kw, remat=REMAT)
    model2d = ctor(**kw, remat=True) if REMAT2D else None
    x3 = jax.random.normal(jax.random.key(0),
                           (BATCH3D, FRAMES, IMG, IMG, 1), jnp.float32)
    # 2D high-res co-training input: t_patch_size replicated frames
    x2 = jax.random.normal(jax.random.key(3),
                           (BATCH2D, TPATCH, IMG2D, IMG2D, 1), jnp.float32)
    params = jax.jit(
        lambda k, x: model.init({"params": k, "masking": k}, x,
                                mask_ratio=MASK3D)
    )(jax.random.key(1), x3)
    sched = schedules.warmup_half_cosine(1.6e-3, 0.0, 1, 50, 1000)
    tx = optim.build_adamw(params, sched, weight_decay=0.05)
    state = TrainState.create(params, tx, jax.random.key(2))

    step = make_mae_train_step(model, tx, joint=True, use_premask=PREMASK,
                               model2d=model2d, accum_2d=ACCUM2D)
    if ACCUM2D > 1:
        assert BATCH2D % ACCUM2D == 0
        x2 = x2.reshape(ACCUM2D, BATCH2D // ACCUM2D, *x2.shape[1:])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_steps(state, x3, x2):
        def body(i, st):
            st, _ = step(st, x3, mask_ratio=MASK3D, batch2d=x2,
                         mask_ratio_2d=MASK2D)
            return st
        return jax.lax.fori_loop(0, STEPS, body, state)

    state = run_steps(state, x3, x2)                      # compile+warmup
    _ = float(jax.tree.leaves(state.params)[0].sum())
    t0 = time.time()
    state = run_steps(state, x3, x2)
    _ = float(jax.tree.leaves(state.params)[0].sum())
    dt = time.time() - t0

    step_ms = dt / STEPS * 1000

    # analytic model FLOPs (train = 3x fwd; remat recompute not counted,
    # as standard for MFU); repo root is already on sys.path (top of file)
    import bench
    flops3d = bench.mae_train_flops(d=ENC_DIM, layers=ENC_LAYERS,
                                    frames=FRAMES, img=IMG, patch=PATCH,
                                    tpatch=TPATCH, mask=MASK3D)
    flops2d = bench.mae2d_train_flops(d=ENC_DIM, layers=ENC_LAYERS,
                                      img2d=IMG2D, patch=PATCH,
                                      tpatch=TPATCH, mask2d=MASK2D)
    step_flops = BATCH3D * flops3d + BATCH2D * flops2d
    mfu = step_flops / (dt / STEPS) / bench.V5E_PEAK_BF16

    result = {
        "metric": (f"joint 3D+2D-{IMG2D} MAE pretrain step "
                   f"({'ViT-H/14' if MODEL == 'vith' else 'ViT-L'}, "
                   + ("vith_mae_tpu_native preset)" if MODEL == "vith"
                      else "ref headline config)")),
        "step_time_ms": round(step_ms, 1),
        "vol3d_per_sec": round(BATCH3D / (dt / STEPS), 2),
        "img2d_per_sec": round(BATCH2D / (dt / STEPS), 2),
        "batch3d": BATCH3D, "batch2d": BATCH2D,
        "mfu": round(mfu, 4),
        "step_flops_T": round(step_flops / 1e12, 2),
        "premask_in_step": PREMASK, "remat": REMAT, "remat_2d": REMAT2D,
        "accum_2d": ACCUM2D, "decoder_num_heads": DEC_HEADS,
        "encoder_num_heads": ENC_HEADS,
    }
    print(json.dumps(result), flush=True)
    # live extras ledger for bench.py (docs/perf/recorded.json)
    from octcubem_tpu.utils.recorded import record
    prefix = "vith_joint" if MODEL == "vith" else "joint"
    record(f"{prefix}_enc{ENC_HEADS}_dec{DEC_HEADS}",
           dict(result, source="scripts/bench_joint.py"))


if __name__ == "__main__":
    main()
