"""Retrieval-serving benchmark: COEM 2-tower paired encode on one chip.

The production retrieval surface (cli/retclip.py --evaluate_only /
cli/retrieval_eval.py, reference retinal-COEM eval path SURVEY §3.5):
OCT volume -> visual tower + enface image -> enface tower, both features
L2-normalized.  Canonical octcube_ir geometry (vision ViT-L ST 60x256^2
gray / enface ViT-L 2D 384^2 RGB, embed 512 — core/config.RetClipConfig).

Knobs:
    RQ_BATCHES=1,4       pair batch sizes
    RQ_QUANT=1           int8 PTQ encoders (ops/quant.py, same path as
                         cli/retclip.py --quant int8)
    RQ_NUM_HEADS=8       vision-tower head repartition (TPU-native
                         encoders pretrained with num_heads=8)

Per the verify skill: steps chained on device with lax.fori_loop, one
host read closes the timing window.
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

STEPS = int(os.environ.get("RQ_STEPS", "20"))
BATCHES = [int(b) for b in os.environ.get("RQ_BATCHES", "1,4").split(",")]
QUANT = os.environ.get("RQ_QUANT", "0") == "1"
NUM_HEADS = int(os.environ.get("RQ_NUM_HEADS", "16"))
FRAMES, OCT, ENF, PATCH, TPATCH = 60, 256, 384, 16, 3
V5E_PEAK_BF16 = 197e12


def fwd_flops_per_pair() -> float:
    """Analytic fwd FLOPs of one paired encode (both ViT-L towers)."""
    d, layers, proj = 1024, 24, 512
    n_oct = (FRAMES // TPATCH) * (OCT // PATCH) ** 2 + 1       # 5121
    n_enf = (ENF // PATCH) ** 2 + 1                            # 577
    def tower(n, in_patch):
        dense = (layers * 2 * n * 12 * d * d
                 + 2 * (n - 1) * in_patch * d       # patch embed
                 + 2 * d * proj)                    # projection head
        attn = layers * 2 * 2 * n * n * d
        return dense + attn
    return tower(n_oct, TPATCH * PATCH ** 2) + tower(n_enf, 3 * PATCH ** 2)


def main():
    from octcubem_tpu.models.coem import COEP2Tower

    vision_cfg = dict(num_frames=FRAMES, t_patch_size=TPATCH, img_size=OCT,
                      patch_size=PATCH, in_chans=1, embed_dim=1024,
                      depth=24, num_heads=NUM_HEADS)
    enface_cfg = dict(img_size=ENF, patch_size=PATCH, in_chans=3,
                      embed_dim=1024, depth=24, num_heads=16)
    kw = dict(embed_dim=512, vision_cfg=vision_cfg, enface_cfg=enface_cfg,
              dtype=jnp.bfloat16, attn_impl="auto")
    model = COEP2Tower(**kw, quant=QUANT)
    fp_model = COEP2Tower(**kw) if QUANT else model

    flops = fwd_flops_per_pair()
    for batch in BATCHES:
        vol = jax.random.normal(jax.random.key(0),
                                (batch, FRAMES, OCT, OCT, 1), jnp.float32)
        enf = jax.random.normal(jax.random.key(1),
                                (batch, ENF, ENF, 3), jnp.float32)
        params = jax.jit(fp_model.init)(jax.random.key(2), vol, enf)
        if QUANT:
            from octcubem_tpu.ops.quant import quantize_tree
            params = jax.jit(
                lambda p: {"params": quantize_tree(p["params"])})(params)

        @jax.jit
        def run(params, vol, enf):
            def body(i, acc):
                # loop-carried dependency defeats LICM without perturbing
                # bf16 inputs (see bench_infer.py)
                fi, fe, _ = model.apply(params, vol + acc * 1e-30, enf)
                return acc + fi.sum().astype(jnp.float32) \
                    + fe.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))

        _ = float(run(params, vol, enf))       # warmup / compile
        t0 = time.time()
        _ = float(run(params, vol, enf))
        dt = time.time() - t0
        step_ms = dt / STEPS * 1000
        pps = batch / (dt / STEPS)
        result = {
            "metric": "COEM 2-tower paired encode (60x256^2 OCT + 384^2 "
                      + ("enface, int8 PTQ)" if QUANT else "enface, bf16)"),
            "quant": QUANT,
            "vision_num_heads": NUM_HEADS,
            "batch": batch,
            "step_time_ms": round(step_ms, 2),
            "value": round(pps, 2),
            "unit": "pairs/sec/chip",
            "mfu": round(flops * pps / V5E_PEAK_BF16, 4),
        }
        print(json.dumps(result), flush=True)
        if batch == 1 and not QUANT and NUM_HEADS == 16:
            # the canonical ledger row (docs/perf/recorded.json)
            from octcubem_tpu.utils.recorded import record
            record("retclip_encode",
                   dict(result, pairs_s=result["value"],
                        source="scripts/bench_retclip_encode.py"))


if __name__ == "__main__":
    main()
