"""Serving benchmark: ViT-L classifier inference throughput on one chip.

Config mirrors the reference inference demo (SURVEY §3.4 /
inference_OCTCube.ipynb: 48x256x256 volume -> 8-disease logits) with the
production bf16 + Pallas-flash path used by cli/predict.py.

Per the verify skill: steps are chained on device with lax.fori_loop and
one host read closes the timing window (block_until_ready does not sync
through the axon relay).  Usage:

    python scripts/bench_infer.py            # batches 1, 4, 8
    IB_BATCHES=4 python scripts/bench_infer.py
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

FRAMES, IMG, TPATCH, PATCH = 48, 256, 3, 16
STEPS = int(os.environ.get("IB_STEPS", "50"))
BATCHES = [int(b) for b in os.environ.get("IB_BATCHES", "1,4,8").split(",")]
# IB_QUANT=1: int8 PTQ serving path — block projections quantized via
# ops.quant.quantize_tree, s8xs8->s32 on the MXU (2x bf16 peak);
# attention stays bf16 flash (ops/quant.py)
QUANT = os.environ.get("IB_QUANT", "0") == "1"
# IB_NUM_HEADS: encoder head partitioning (16 = reference parity,
# head_dim 64; 8 = TPU-native head_dim 128 — attention is ~57% of the
# classifier's fwd FLOPs at N=4097, so lane occupancy matters here the
# way it did for the MAE decoder).  Param tree identical across counts.
NUM_HEADS = int(os.environ.get("IB_NUM_HEADS", "16"))
V5E_PEAK_BF16 = 197e12


def fwd_flops_per_volume() -> float:
    """Analytic fwd FLOPs of the ViT-L classifier, per volume."""
    d, layers = 1024, 24
    n = (FRAMES // TPATCH) * (IMG // PATCH) ** 2 + 1   # 4097 tokens + cls
    dense = layers * 2 * n * 12 * d * d + 2 * (n - 1) * (TPATCH * PATCH ** 2) * d
    attn = layers * 2 * 2 * n * n * d
    return dense + attn


def main():
    from octcubem_tpu.models import vit_st

    kw = dict(num_frames=FRAMES, t_patch_size=TPATCH, img_size=IMG,
              in_chans=1, num_classes=16, head_type="dropout",
              global_pool=True, dtype=jnp.bfloat16, attn_impl="auto",
              num_heads=NUM_HEADS)
    model = vit_st.flash_attn_vit_large_patch16(**kw, quant=QUANT)
    fp_model = (vit_st.flash_attn_vit_large_patch16(**kw) if QUANT else model)

    flops = fwd_flops_per_volume()
    for batch in BATCHES:
        x = jax.random.normal(jax.random.key(0),
                              (batch, FRAMES, IMG, IMG, 1), jnp.float32)
        params = jax.jit(fp_model.init)(jax.random.key(1), x)
        if QUANT:
            from octcubem_tpu.ops.quant import quantize_tree
            params = jax.jit(
                lambda p: {"params": quantize_tree(p["params"])})(params)

        @jax.jit
        def run(params, x):
            def body(i, acc):
                # acc*1e-30 keeps a loop-carried data dependency (defeats
                # LICM) without perturbing bf16 inputs; *0.0 would be
                # algebraically simplified away.
                out = model.apply(params, x + acc * 1e-30)
                return acc + out.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))

        _ = float(run(params, x))          # warmup / compile
        t0 = time.time()
        _ = float(run(params, x))
        dt = time.time() - t0
        step_ms = dt / STEPS * 1000
        vps = batch / (dt / STEPS)
        result = {
            "metric": "ViT-L classifier inference (48x256x256, "
                      + ("int8 PTQ + bf16 flash)" if QUANT else "bf16 flash)"),
            "quant": QUANT,
            "num_heads": NUM_HEADS,
            "batch": batch,
            "step_time_ms": round(step_ms, 2),
            "value": round(vps, 2),
            "unit": "volumes/sec/chip",
            "mfu": round(flops * vps / V5E_PEAK_BF16, 4),
        }
        print(json.dumps(result), flush=True)
        if batch == 1:  # serving optimum (NOTES_ROUND4): the ledger row
            from octcubem_tpu.utils.recorded import record
            record(f"serving_enc{NUM_HEADS}" + ("_int8" if QUANT else ""),
                   dict(result, vol_s=result["value"],
                        source="scripts/bench_infer.py"))


if __name__ == "__main__":
    main()
