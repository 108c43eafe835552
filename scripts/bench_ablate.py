"""Step-time ablation of the headline bench: what does the full ViT-L MAE
train step cost with pieces removed?

ABLATE=none      full step (bench.py equivalent)
ABLATE=attn      attention replaced by identity (out = v): measures
                 'everything else' (linears, patchify, masking, loss,
                 optimizer)
ABLATE=fwdonly   forward + loss only, no grads/optimizer
ABLATE=noopt     fwd+bwd but no optimizer update (grads computed, params
                 returned unchanged)
ABLATE=nogather  decoder unshuffle gather replaced by identity (encode's
                 shape-changing keep-gather untouched): bounds the win
                 available from fusing the unshuffle into the decoder's
                 first read (VERDICT r3 item 4)
ABLATE=noln      every LayerNorm replaced by identity: upper-bounds the
                 win from folding pre-attention LNs into kernel
                 prologues (VERDICT r3 item 4)

Usage: ABLATE=attn python scripts/bench_ablate.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ABLATE = os.environ.get("ABLATE", "none")
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
FRAMES, IMG, TPATCH = 60, 256, 3
MASK_RATIO = 0.9
STEPS = 8

if ABLATE == "attn":
    from octcubem_tpu.ops import attention

    def _identity_attention(q, k, v, scale=None, impl="auto"):
        return v

    def _identity_packed(q, k, v, num_heads, scale=None, impl="auto"):
        return v

    def _identity_qkv(qkv, num_heads, scale=None, impl="auto"):
        hd = qkv.shape[-1] // 3
        return qkv[:, :, 2 * hd:]

    attention.multi_head_attention = _identity_attention
    attention.multi_head_attention_packed = _identity_packed
    attention.multi_head_attention_qkv = _identity_qkv
    # layers binds the names at import time; patch its references too
    import octcubem_tpu.nn.layers as _layers
    _layers.multi_head_attention = _identity_attention
    _layers.multi_head_attention_packed = _identity_packed
    _layers.multi_head_attention_qkv = _identity_qkv

if ABLATE == "noln":
    import flax.linen as _nn

    class _IdentityLN(_nn.Module):
        """Timing stand-in: same call signature, no normalize work."""
        epsilon: float = 1e-6
        dtype: object = None
        use_bias: bool = True
        use_scale: bool = True

        @_nn.compact
        def __call__(self, x):
            return x if self.dtype is None else x.astype(self.dtype)

    _nn.LayerNorm = _IdentityLN

from octcubem_tpu.models import mae3d
from octcubem_tpu.train import optim, schedules

if ABLATE == "nogather":
    _real_gather = mae3d.gather_tokens

    def _skip_unshuffle(x, ids):
        # unshuffle gathers are full-length permutations (ids spans all
        # rows); keep-gathers change the row count and stay real
        if ids.shape[1] == x.shape[1]:
            return x
        return _real_gather(x, ids)

    mae3d.gather_tokens = _skip_unshuffle
from octcubem_tpu.train.train_state import TrainState
from octcubem_tpu.train.mae_engine import make_mae_train_step


def main():
    # BENCH_DEC_HEADS: ablate the TPU-native decoder geometry too
    # (16 = parity hd-32, 4 = vitl_mae_tpu_native hd-128)
    model = mae3d.flash_attn_mae_vit_large_patch16(
        num_frames=FRAMES, t_patch_size=TPATCH, pred_t_dim=FRAMES,
        input_size=IMG, high_res_input_size=512, in_chans=1,
        dtype=jnp.bfloat16, attn_impl="auto",
        num_heads=int(os.environ.get("BENCH_ENC_HEADS", "16")),
        decoder_num_heads=int(os.environ.get("BENCH_DEC_HEADS", "16")))
    x = jax.random.normal(jax.random.key(0), (BATCH, FRAMES, IMG, IMG, 1),
                          jnp.float32)
    params = jax.jit(lambda k, x: model.init(
        {"params": k, "masking": k}, x, mask_ratio=MASK_RATIO))(
            jax.random.key(1), x)
    sched = schedules.warmup_half_cosine(1.6e-3, 0.0, 1, 50, 1000)
    tx = optim.build_adamw(params, sched, weight_decay=0.05)
    state = TrainState.create(params, tx, jax.random.key(2))

    if ABLATE == "fwdonly":
        @functools.partial(jax.jit, donate_argnums=())
        def run(state, x):
            def body(i, acc):
                loss, _, _, _ = model.apply(
                    state.params, x, mask_ratio=MASK_RATIO,
                    deterministic=False,
                    rngs={"masking": jax.random.fold_in(state.rng, i),
                          "dropout": jax.random.fold_in(state.rng, i)})
                return acc + loss
            return jax.lax.fori_loop(0, STEPS, body, 0.0)

        _ = float(run(state, x))
        t0 = time.time()
        out = float(run(state, x))
        dt = (time.time() - t0) / STEPS * 1000
        print(f"ABLATE={ABLATE}: {dt:.1f} ms/step (loss {out:.3f})")
        return

    if ABLATE == "noopt":
        def loss_fn(p, r):
            loss, _, _, _ = model.apply(
                p, x, mask_ratio=MASK_RATIO, deterministic=False,
                rngs={"masking": r, "dropout": r})
            return loss

        @jax.jit
        def run(state, x):
            def body(i, acc):
                r = jax.random.fold_in(state.rng, i)
                loss, grads = jax.value_and_grad(loss_fn)(state.params, r)
                gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g in jax.tree.leaves(grads))
                return acc + loss + 0 * gn
            return jax.lax.fori_loop(0, STEPS, body, 0.0)

        _ = float(run(state, x))
        t0 = time.time()
        out = float(run(state, x))
        dt = (time.time() - t0) / STEPS * 1000
        print(f"ABLATE={ABLATE}: {dt:.1f} ms/step (acc {out:.3f})")
        return

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
    dt = (time.time() - t0) / STEPS * 1000
    print(f"ABLATE={ABLATE}: {dt:.1f} ms/step")


if __name__ == "__main__":
    main()
