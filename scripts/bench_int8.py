"""Raw int8-vs-bf16 matmul rates on this chip/toolchain.

Answers whether XLA lowers s8 x s8 -> s32 dot_general onto the v5e's 2x
int8 MXU path (394 vs 197 TOPS), and what the dynamic-quantization
epilogue costs — context for the measured int8 PTQ serving delta
(scripts/bench_infer.py IB_QUANT=1, NOTES_ROUND3.md).

Per the verify skill: fori_loop-chained on device, one host read.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M = int(os.environ.get("BI8_M", "4096"))
K = int(os.environ.get("BI8_K", "1024"))
N = int(os.environ.get("BI8_N", "4096"))
STEPS = int(os.environ.get("BI8_STEPS", "100"))


def timed(fn, *args):
    out = fn(*args)
    _ = float(jnp.asarray(out).astype(jnp.float32).sum())
    t0 = time.time()
    out = fn(*args)
    _ = float(jnp.asarray(out).astype(jnp.float32).sum())
    return time.time() - t0


def main():
    kx, kw = jax.random.split(jax.random.key(0))
    xf = jax.random.normal(kx, (M, K), jnp.float32)
    wf = jax.random.normal(kw, (K, N), jnp.float32) * 0.05
    xb, wb = xf.astype(jnp.bfloat16), wf.astype(jnp.bfloat16)
    xq = jnp.clip(jnp.round(xf * 16), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(wf * 512), -127, 127).astype(jnp.int8)

    def chain(mm, a, b):
        @jax.jit
        def run(a, b):
            def body(i, acc):
                return acc + mm(a, b)[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))
        return run

    def mm_bf16(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def mm_int8(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def mm_dynq(a, b):
        # full dynamic-quant path as used by ops.quant.int8_matmul
        from octcubem_tpu.ops.quant import int8_matmul, quantize_weight
        w_q, s = quantize_weight(b)
        return int8_matmul(a, w_q, s)

    flops = 2.0 * M * K * N
    res = {"m": M, "k": K, "n": N}
    for name, (a, b, mm) in {
        "bf16": (xb, wb, mm_bf16),
        "int8": (xq, wq, mm_int8),
        "dynq_from_bf16": (xb, wf, mm_dynq),
    }.items():
        dt = timed(chain(mm, a, b), a, b) / STEPS
        res[name] = {"us": round(dt * 1e6, 1),
                     "tflops": round(flops / dt / 1e12, 1)}
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
