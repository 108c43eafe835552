"""Decoder-geometry quality ablation: does the TPU-native decoder
(decoder_num_heads=4, head_dim 128) learn like the parity decoder
(16 heads, head_dim 32)?

The MAE decoder is a pretraining scaffold discarded after pretraining
(only the encoder ships; Pre-training/models_mae_joint_res_flash_attn.py
:807-843 fixes 512/16h for the released runs but the geometry is a free
hyperparameter).  Same total decoder width/depth/FLOPs either way — the
head count only re-partitions the attention projections — so the
trajectories should match within seed noise.

Protocol: identical data stream (structured, learnable: smooth random
low-frequency volumes so masked-patch prediction has signal), identical
seeds and LR schedule, N steps per geometry; writes a JSONL curve per
config to /tmp/dec_quality.jsonl.  Run on the real chip (fori_loop-
chained segments, one host sync per segment — verify-skill timing rules).

    DQ_STEPS=200 DQ_SEG=10 python scripts/bench_dec_quality.py
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

STEPS = int(os.environ.get("DQ_STEPS", "200"))
SEG = int(os.environ.get("DQ_SEG", "10"))       # steps per device segment
BATCH = int(os.environ.get("DQ_BATCH", "4"))
# DQ_MODEL=vith: ViT-H/14 at 224^2 (the vith_mae_tpu_native geometry) —
# used for the enc-16(hd80)-vs-enc-10(hd128) neutrality curve, since the
# round-4 evidence was ViT-L-only (round-5 verdict item 3)
MODEL = os.environ.get("DQ_MODEL", "vitl")
FRAMES, IMG = (60, 224) if MODEL == "vith" else (60, 256)
N_VOLS = int(os.environ.get("DQ_NVOLS", "16"))  # fixture pool size


def make_fixture(n, seed=0):
    """Smooth low-frequency random volumes: enough structure that masked
    reconstruction is learnable (pure noise would pin the loss at the
    data variance for ANY decoder)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, 8, 16, 16)).astype(np.float32)
    x = jnp.asarray(base)
    x = jax.image.resize(x, (n, FRAMES, IMG, IMG), "trilinear")
    x = (x - x.mean()) / (x.std() + 1e-6)
    return np.asarray(x)[..., None]


def run_config(dec_heads: int, data: np.ndarray, enc_heads: int = 16):
    from octcubem_tpu.models import mae3d
    from octcubem_tpu.train import optim, schedules
    from octcubem_tpu.train.train_state import TrainState
    from octcubem_tpu.train.mae_engine import make_mae_train_step

    ctor = (mae3d.mae_vit_huge_patch14 if MODEL == "vith"
            else mae3d.flash_attn_mae_vit_large_patch16)
    model = ctor(
        num_frames=FRAMES, t_patch_size=3, pred_t_dim=FRAMES,
        input_size=IMG, high_res_input_size=2 * IMG, in_chans=1,
        dtype=jnp.bfloat16, attn_impl="auto",
        num_heads=enc_heads, decoder_num_heads=dec_heads)
    x0 = jnp.asarray(data[:BATCH])
    params = jax.jit(
        lambda k, x: model.init({"params": k, "masking": k}, x,
                                mask_ratio=0.9))(jax.random.key(1), x0)
    sched = schedules.warmup_half_cosine(1.6e-3, 0.0, 1, 40, STEPS)
    tx = optim.build_adamw(params, sched, weight_decay=0.05)
    state = TrainState.create(params, tx, jax.random.key(2))
    step = make_mae_train_step(model, tx, joint=False)
    pool = jnp.asarray(data)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_seg(state, seg_idx):
        def body(i, carry):
            st, loss_sum = carry
            t = seg_idx * SEG + i
            k = jax.random.fold_in(jax.random.key(7), t)
            sel = jax.random.randint(k, (BATCH,), 0, pool.shape[0])
            st, m = step(st, pool[sel], mask_ratio=0.9)
            return st, loss_sum + m["loss"]
        st, loss_sum = jax.lax.fori_loop(0, SEG, body, (state, 0.0))
        return st, loss_sum / SEG

    curve = []
    t0 = time.time()
    for s in range(STEPS // SEG):
        state, mean_loss = run_seg(state, s)
        ml = float(mean_loss)  # host sync per segment
        curve.append({"step": (s + 1) * SEG, "loss": ml})
        print(f"enc_heads={enc_heads} dec_heads={dec_heads} "
              f"step {(s+1)*SEG}: loss {ml:.4f}", flush=True)
        assert np.isfinite(ml), "non-finite loss"
    wall = time.time() - t0
    return {"dec_heads": dec_heads, "enc_heads": enc_heads, "curve": curve,
            "wall_s": round(wall, 1),
            "step_ms": round(1000 * wall / STEPS, 1)}


def main():
    data = make_fixture(N_VOLS)
    out = []
    # DQ_HEADS entries: "dec" or "enc:dec" head counts per config —
    # e.g. DQ_HEADS=16:16,8:4 compares the full parity geometry against
    # the full TPU-native one (encoder hd 128, decoder hd 128)
    for spec in os.environ.get("DQ_HEADS", "16,4").split(","):
        if ":" in spec:
            e, h = (int(v) for v in spec.split(":"))
        else:
            e, h = 16, int(spec)
        out.append(run_config(h, data, enc_heads=e))
    path = os.environ.get("DQ_OUT", "/tmp/dec_quality.jsonl")
    with open(path, "w") as f:
        for r in out:
            f.write(json.dumps(r) + "\n")
    # summary: final-quartile mean loss per config + relative gap
    finals = {f"{r['enc_heads']}:{r['dec_heads']}":
              float(np.mean([c["loss"] for c in
                             r["curve"][-len(r["curve"])//4:]]))
              for r in out}
    print(json.dumps({"final_quartile_loss": finals}))


if __name__ == "__main__":
    main()
