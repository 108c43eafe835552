"""Measure real LiT locking (partition) vs zero-scale fallback on TPU.

The canonical OCTCube-IR config locks the ViT-L visual tower except 9
groups (train_IR_512-MAE3D-nodrop-vit-large.sh). Round 2 froze via
zero-scaled updates (full backward + moments still computed); round 3's
lock_mode='partition' skips the frozen backward and drops the moments.
This script times one contrastive train step both ways on the real chip.

Usage:  python scripts/bench_lit.py [frames] [batch] [steps]
        (defaults 60 8 4 — ViT-L towers; drop frames for faster compile)

Timing per the verify skill: steps chained on device via lax.fori_loop,
one host read closes the window.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 60
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def main():
    from octcubem_tpu.models import coem
    from octcubem_tpu.train import clip_engine, optim
    from octcubem_tpu.train.train_state import TrainState

    vcfg = dict(num_frames=FRAMES, t_patch_size=3, img_size=256,
                patch_size=16, in_chans=1, embed_dim=1024, depth=24,
                num_heads=16)
    ecfg = dict(img_size=384, patch_size=16, in_chans=3, embed_dim=1024,
                depth=24, num_heads=16)
    # remat mirrors the canonical config's grad_checkpointing=True
    # (without it the unlocked-towers backward OOMs at batch 8)
    model = coem.COEP2Tower(embed_dim=512, vision_cfg=vcfg,
                            enface_cfg=ecfg, dtype=jnp.bfloat16,
                            remat=True)
    img = jax.random.normal(jax.random.key(0),
                            (BATCH, FRAMES, 256, 256, 1), jnp.float32)
    enf = jax.random.normal(jax.random.key(1), (BATCH, 384, 384, 3),
                            jnp.float32)
    params = jax.jit(model.init)(jax.random.key(2), img, enf)

    # the canonical OCTCube-IR lock: visual frozen except 9 unlocked
    # groups — same mask builder the CLI uses (optim.lit_lock_scales)
    scales = optim.lit_lock_scales(params, depth=24, n_unlocked=9)
    batch = {"image": img, "enface": enf}

    def run(step, state):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def loop(state):
            def body(i, st):
                st, _ = step(st, batch)
                return st
            return jax.lax.fori_loop(0, STEPS, body, state)

        # donated outputs come back with DIFFERENT layouts than the
        # original inputs, and the layout fixpoint takes a couple of
        # round trips — measured: call0 compile, calls 1-2 recompile,
        # call 3 steady (NOTES_ROUND3).  A fixed 4 warmups rides past
        # the fixpoint (cache-hit recompiles are fast but still change
        # layouts, so a "fast call" heuristic breaks too early).
        for _ in range(4):
            state = loop(state)
            _ = float(jax.tree.leaves(state.params)[0].sum())
        t0 = time.time()
        state = loop(state)
        _ = float(jax.tree.leaves(state.params)[0].sum())
        return (time.time() - t0) / STEPS

    # --- partition (real freeze)
    partition = optim.make_partition(jax.tree.map(lambda s: s > 0, scales))
    tr0, _ = partition[0](params)
    n_frozen = len(jax.tree.leaves(params)) - len(tr0)
    tx_p = optim.build_adamw(tr0, 1e-4, weight_decay=0.1, betas=(0.9, 0.98))
    st_p = TrainState.create(jax.tree.map(jnp.array, params), tx_p,
                             jax.random.key(3), tx_params=tr0)
    step_p = clip_engine.make_clip_train_step(model, tx_p,
                                              partition=partition)
    t_part = run(step_p, st_p)
    print(f"partition: {t_part * 1e3:.1f} ms/step "
          f"({n_frozen} frozen tensors)")

    # --- zero-scale fallback
    import optax

    tx_z = optax.chain(
        optim.build_adamw(params, 1e-4, weight_decay=0.1, betas=(0.9, 0.98)),
        optim.scale_by_tree(scales))
    st_z = TrainState.create(jax.tree.map(jnp.array, params), tx_z,
                             jax.random.key(3))
    step_z = clip_engine.make_clip_train_step(model, tx_z)
    t_zs = run(step_z, st_z)
    print(f"zero_scale: {t_zs * 1e3:.1f} ms/step")
    print(f"speedup: {t_zs / t_part:.2f}x  (saved {1e3 * (t_zs - t_part):.1f} "
          f"ms/step; frames={FRAMES} batch={BATCH})")


if __name__ == "__main__":
    main()
