"""Dump the backend-optimized HLO of the bench train step (copy hunt).

Builds the same ViT-L MAE train step as bench.py, compiles it for the
attached TPU, and writes the optimized HLO module text to
/tmp/step_hlo.txt for offline grepping (layout copies / transposes
around the Pallas custom-calls).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
FRAMES, IMG, PATCH, TPATCH = 60, 256, 16, 3
MASK_RATIO = 0.90


def main():
    from octcubem_tpu.models import mae3d
    from octcubem_tpu.train import optim, schedules
    from octcubem_tpu.train.train_state import TrainState
    from octcubem_tpu.train.mae_engine import make_mae_train_step

    model = mae3d.flash_attn_mae_vit_large_patch16(
        num_frames=FRAMES, t_patch_size=TPATCH, pred_t_dim=FRAMES,
        input_size=IMG, high_res_input_size=512, in_chans=1,
        dtype=jnp.bfloat16, attn_impl="auto", remat=False,
    )
    x = jax.random.normal(jax.random.key(0), (BATCH, FRAMES, IMG, IMG, 1),
                          jnp.float32)
    params = jax.jit(
        lambda k, x: model.init({"params": k, "masking": k}, x,
                                mask_ratio=MASK_RATIO)
    )(jax.random.key(1), x)
    sched = schedules.warmup_half_cosine(1.6e-3, 0.0, 1, 50, 1000)
    tx = optim.build_adamw(params, sched, weight_decay=0.05)
    state = TrainState.create(params, tx, jax.random.key(2))
    step = jax.jit(
        make_mae_train_step(model, tx, joint=False, donate=False),
        static_argnames=("mask_ratio",))

    lowered = step.lower(state, x, mask_ratio=MASK_RATIO)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = "/tmp/step_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {out}", flush=True)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        for k in ("flops", "bytes accessed", "optimal_seconds"):
            if k in ca:
                print(f"{k}: {ca[k]:.3e}")
    except Exception as e:  # cost analysis may not survive the relay
        print("cost_analysis unavailable:", e)


if __name__ == "__main__":
    main()
