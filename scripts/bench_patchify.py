"""Micro-bench: visible-tube extraction strategies (v5e, fori_loop-chained).

Compares, at the bench shape [4, 60, 256, 256, 1] bf16 with len_keep 512:
  full    patchify_3d (full-volume 8-d transpose) -> gather_tokens
  gfirst  free reshape -> advanced-index gather of kept tubes only
and full-volume patchify alone (the fp32 loss-target path shape).

Timing per the verify skill: chain iterations on device with
lax.fori_loop and close the window with one host read (block_until_ready
does not sync through the axon relay).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octcubem_tpu.ops.masking import gather_tokens, random_masking
from octcubem_tpu.ops.patchify import patchify_3d

B, T, H, W, C = 4, 60, 256, 256, 1
TP, P = 3, 16
MASK = 0.90
ITERS = 50


def gather_tube_patches(x, ids_keep, t_patch, patch):
    """gather_tokens(patchify_3d(x), ids) without the full transpose."""
    b, t, h, w, c = x.shape
    tt, hh, ww = t // t_patch, h // patch, w // patch
    x8 = x.reshape(b, tt, t_patch, hh, patch, ww, patch, c)  # free reshape
    ti = ids_keep // (hh * ww)
    rem = ids_keep % (hh * ww)
    hi, wi = rem // ww, rem % ww
    bi = jnp.arange(b)[:, None]
    vis = x8[bi, ti, :, hi, :, wi, :, :]  # [B, K, tp, p, p, c]
    return vis.reshape(b, ids_keep.shape[1], t_patch * patch * patch * c)


def timed(fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _ = float(jnp.sum(out))  # compile + sync
    t0 = time.time()
    out = fn_j(*args)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / ITERS * 1000
    return dt


def chain(body):
    def fn(x, ids):
        def step(i, acc):
            return acc + jnp.sum(body(x, ids), dtype=jnp.float32)
        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0))
    return fn


def main():
    x = jax.random.normal(jax.random.key(0), (B, T, H, W, C), jnp.bfloat16)
    xf = x.astype(jnp.float32)
    mk = random_masking(jax.random.key(1), B, (T // TP) * (H // P) * (W // P),
                        MASK)
    ids = mk.ids_keep

    ref = gather_tokens(patchify_3d(x, TP, P), ids)
    new = gather_tube_patches(x, ids, TP, P)
    assert ref.shape == new.shape and bool(jnp.all(ref == new)), "mismatch"
    print("bit-identical: OK", flush=True)

    full = chain(lambda x, ids: gather_tokens(patchify_3d(x, TP, P), ids))
    gfirst = chain(lambda x, ids: gather_tube_patches(x, ids, TP, P))
    pat_only = chain(lambda x, ids: patchify_3d(x, TP, P))

    print(f"full (patchify+gather, bf16): {timed(full, x, ids):7.3f} ms")
    print(f"gather-first          (bf16): {timed(gfirst, x, ids):7.3f} ms")
    print(f"patchify full-volume  (bf16): {timed(pat_only, x, ids):7.3f} ms")
    print(f"patchify full-volume  (fp32): {timed(pat_only, xf, ids):7.3f} ms")


if __name__ == "__main__":
    main()
