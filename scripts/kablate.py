"""Ablation harness for the flash-attention kernels at the decoder shape.

Each variant strips or alters one part of the fwd/bwd kernel to locate
the bottleneck (results are numerically meaningless for stripped ops).

Usage: python scripts/kablate.py VARIANT [VARIANT...]
  fwd variants: base, noexp, nosum, qkonly, mxonly
  fwd tile variants: f512x512, f1024x512, f512x1024, f2048x1024
  bwd tile variants: b512x1024 (current), b1024x1024, b512x512, b1024x2048
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BH, N, D = 64, 5121, 32
ITERS = 20
SHIFT = 16.0
CLAMP = 40.0


def fwd_variant(block_q, block_k, *, exp=True, rowsum=True, pv=True,
                s_dtype=jnp.float32):
    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, l_ref):
        kb = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(kb == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            l_ref[:] = jnp.zeros_like(l_ref)

        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=s_dtype).astype(jnp.float32) * (D ** -0.5)
        if exp:
            p = jnp.exp(jnp.minimum(s, CLAMP) - SHIFT)
        else:
            p = s
        if rowsum:
            l_ref[:] = l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
        if pv:
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc_ref[:] = acc_ref[:] + p[:, :D]

        @pl.when(kb == nk - 1)
        def _fin():
            l = jnp.maximum(l_ref[:], 1.0) if rowsum else 1.0
            o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
            lse_ref[0] = l_ref[:]

    def run(q, k, v):
        n_pad = (N + max(block_q, block_k) - 1) // max(block_q, block_k) \
            * max(block_q, block_k)
        pad = n_pad - N
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        out, _ = pl.pallas_call(
            kernel,
            grid=(BH, n_pad // block_q, n_pad // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BH, n_pad, D), q.dtype),
                jax.ShapeDtypeStruct((BH, n_pad, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, D), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
        )(qp, kp, vp)
        return out[:, :N]

    return run


def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, carry):
            q = carry[0] + jnp.float32(i).astype(carry[0].dtype) * 0
            out = fn(q, *carry[1:])
            return (out.astype(carry[0].dtype),) + carry[1:]
        return jax.lax.fori_loop(0, ITERS, body, a)

    try:
        r = loop(*args)
        _ = float(jax.tree.leaves(r)[0].sum())
        t0 = time.time()
        r = loop(*args)
        _ = float(jax.tree.leaves(r)[0].sum())
        dt = (time.time() - t0) / ITERS * 1000
        print(f"{name}: {dt:.2f} ms/iter")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


def main():
    variants = sys.argv[1:] or ["base"]
    key = jax.random.key(0)
    q = jax.random.normal(key, (BH, N, D), jnp.bfloat16)
    k = jax.random.normal(key, (BH, N, D), jnp.bfloat16)
    v = jax.random.normal(key, (BH, N, D), jnp.bfloat16)

    fwd_tiles = {"f512x512": (512, 512), "f1024x512": (1024, 512),
                 "f512x1024": (512, 1024), "f2048x1024": (2048, 1024),
                 "f1024x2048": (1024, 2048), "f2048x2048": (2048, 2048),
                 "f896x896": (896, 896), "f768x768": (768, 768)}

    for vname in variants:
        if vname == "base":
            timeit("fwd base 1024x1024", fwd_variant(1024, 1024), q, k, v)
        elif vname == "noexp":
            timeit("fwd no-exp", fwd_variant(1024, 1024, exp=False), q, k, v)
        elif vname == "nosum":
            timeit("fwd no-rowsum", fwd_variant(1024, 1024, rowsum=False),
                   q, k, v)
        elif vname == "qkonly":
            timeit("fwd qk-only (no pv)", fwd_variant(1024, 1024, pv=False),
                   q, k, v)
        elif vname == "mxonly":
            timeit("fwd matmuls-only", fwd_variant(
                1024, 1024, exp=False, rowsum=False), q, k, v)
        elif vname == "mxbf16":
            timeit("fwd bf16-score", fwd_variant(
                1024, 1024, s_dtype=jnp.bfloat16), q, k, v)
        elif vname in fwd_tiles:
            bq, bk = fwd_tiles[vname]
            timeit(f"fwd {bq}x{bk}", fwd_variant(bq, bk), q, k, v)
        elif vname.startswith("b"):
            bq, bk = map(int, vname[1:].split("x"))
            import octcubem_tpu.ops.flash_attention as fa
            fa.BWD_BLOCK_Q_TARGET = bq
            fa.BWD_BLOCK_K_TARGET = bk
            q4 = q.reshape(4, 16, N, D)
            k4 = k.reshape(4, 16, N, D)
            v4 = v.reshape(4, 16, N, D)

            def fwdbwd(q, k, v):
                def loss(q, k, v):
                    o = fa.flash_attention(q, k, v)
                    return (o.astype(jnp.float32) ** 2).sum()
                return jax.grad(loss, argnums=(0,))(q, k, v)[0]

            timeit(f"f+b bwd {bq}x{bk}", fwdbwd, q4, k4, v4)
        else:
            print("unknown variant", vname)


if __name__ == "__main__":
    main()
