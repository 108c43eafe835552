"""Micro-costs of the non-attention step components at the bench shape
(batch 4, ViT-L MAE): masking argsort, decoder unshuffle gather, patchify
einsum, LayerNorm — the 'everything-else' decomposition behind the
~15ms-over-ideal residual (NOTES_ROUND3.md step breakdown).

Usage: python scripts/bench_micro.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 50
B, L, D = 4, 5120, 512


def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, carry):
            return fn(i, *carry)
        return jax.lax.fori_loop(0, ITERS, body, a)

    r = loop(*args)
    _ = float(jax.tree.leaves(r)[0].sum())
    t0 = time.time()
    r = loop(*args)
    _ = float(jax.tree.leaves(r)[0].sum())
    print(f"{name}: {(time.time() - t0) / ITERS * 1000:.3f} ms")


def main():
    from octcubem_tpu.ops.masking import random_masking, gather_tokens

    key = jax.random.key(0)

    # masking: noise + argsort + inverse-perm scatter (fwd only)
    def mask_fn(i, acc):
        k = jax.random.fold_in(key, i)
        mk = random_masking(k, B, L, 0.9)
        return (acc + mk.ids_restore.sum(),)

    timeit("random_masking (argsort+scatter) [4,5120]", mask_fn,
           jnp.zeros((), jnp.int32))

    # decoder unshuffle gather [4,5121,512]
    x = jax.random.normal(key, (B, L + 1, D), jnp.bfloat16)
    ids = jnp.tile(jnp.arange(L + 1)[None], (B, 1))

    def gath(i, x):
        return (gather_tokens(x, ids),)

    timeit("unshuffle gather [4,5121,512]", gath, x)

    # patchify einsum [4,60,256,256,1] -> [4,20,256,1024]
    img = jax.random.normal(key, (4, 60, 256, 256, 1), jnp.bfloat16)
    w = jax.random.normal(key, (3 * 16 * 16, 1024), jnp.bfloat16)

    def patch(i, img):
        p = img.reshape(4, 20, 3, 16, 16, 16, 16, 1)
        p = p.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(4, 20, 256, -1)
        out = (p @ w).astype(jnp.bfloat16)
        return (img * (1 + 0 * out[0, 0, 0, 0]),)

    timeit("patchify reshape+matmul", patch, img)

    # decoder LayerNorm fp32 [4,5121,512]
    def ln(i, x):
        m = x.astype(jnp.float32)
        mu = m.mean(-1, keepdims=True)
        v = ((m - mu) ** 2).mean(-1, keepdims=True)
        return (((m - mu) / jnp.sqrt(v + 1e-6)).astype(x.dtype),)

    timeit("LayerNorm fp32 [4,5121,512]", ln, x)


if __name__ == "__main__":
    main()
