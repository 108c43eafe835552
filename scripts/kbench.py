"""Kernel microbenchmark at the ViT-L MAE decoder shape (the hot op).

Usage: python scripts/kbench.py [fwd|bwd|both] [iters]
Chains iterations on device via lax.fori_loop (the axon relay does not
sync through block_until_ready; one host read closes the window).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octcubem_tpu.ops.flash_attention import flash_attention

MODE = sys.argv[1] if len(sys.argv) > 1 else "both"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
B = int(os.environ.get("KB_B", "4"))
H = int(os.environ.get("KB_H", "16"))
N = int(os.environ.get("KB_N", "5121"))
D = int(os.environ.get("KB_D", "32"))

if os.environ.get("KB_BWDQ"):
    import octcubem_tpu.ops.flash_attention as _fa
    _fa.BWD_BLOCK_TARGET = int(os.environ["KB_BWDQ"])
if os.environ.get("KB_FWDQ"):
    import octcubem_tpu.ops.flash_attention as _fa
    _fa.FWD_BLOCK_TARGET = int(os.environ["KB_FWDQ"])

key = jax.random.key(0)
q = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)
k = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)
v = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)


def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, carry):
            out = fn(*[c + 0 if j == 0 else c for j, c in enumerate(carry)])
            return tuple(o.astype(c.dtype) for o, c in zip(out, carry))
        return jax.lax.fori_loop(0, ITERS, body, a)

    r = loop(*args)
    _ = float(jax.tree.leaves(r)[0].sum())  # compile + warmup sync
    t0 = time.time()
    r = loop(*args)
    _ = float(jax.tree.leaves(r)[0].sum())
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name}: {dt:.2f} ms/iter")
    return dt


if os.environ.get("KB_FUSED"):
    # fused-qkv path: one [B, N, 3HD] buffer, kernels read via
    # minor-offset BlockSpecs (flash_attention_packed_qkv)
    from octcubem_tpu.ops.flash_attention import flash_attention_packed_qkv

    qkv = jnp.concatenate(
        [x.transpose(0, 2, 1, 3).reshape(B, N, H * D) for x in (q, k, v)],
        axis=-1)
    q, k, v = qkv, qkv[:, :, :1], qkv[:, :, :1]  # k/v unused placeholders

    def attn(qkv, *_):
        o = flash_attention_packed_qkv(qkv, H)
        # carry must keep the fused [B,N,3HD] shape for the fori chain;
        # the tile adds ~one 3x copy per iter (noted, constant overhead)
        return jnp.tile(o, (1, 1, 3))
elif os.environ.get("KB_PACKED"):
    from octcubem_tpu.ops.flash_attention import flash_attention_packed

    q = q.transpose(0, 2, 1, 3).reshape(B, N, H * D)
    k = k.transpose(0, 2, 1, 3).reshape(B, N, H * D)
    v = v.transpose(0, 2, 1, 3).reshape(B, N, H * D)

    def attn(q, k, v):
        return flash_attention_packed(q, k, v, H)
else:
    def attn(q, k, v):
        return flash_attention(q, k, v)

if MODE in ("fwd", "both"):
    def fwd_only(q, k, v):
        o = attn(q, k, v)
        return (o, k, v)

    timeit(f"fwd  (B{B} H{H} N{N} D{D})", fwd_only, q, k, v)

if MODE in ("bwd", "both"):
    def fwdbwd(q, k, v):
        def loss(q, k, v):
            return (attn(q, k, v).astype(jnp.float32) ** 2).sum()
        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return g

    timeit(f"f+b  (B{B} H{H} N{N} D{D})", fwdbwd, q, k, v)
