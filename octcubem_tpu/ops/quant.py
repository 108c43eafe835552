"""Int8 post-training quantization for the serving path.

The reference has no quantized inference (fp16 autocast only,
inference_OCTCube.ipynb); this is TPU-native serving headroom: v5e's MXU
runs s8 x s8 -> s32 matmuls at 2x the bf16 rate (394 vs 197 TOPS), so
quantizing the transformer's dense projections (Wqkv / out_proj / fc1 /
fc2 — ~60% of classifier inference FLOPs) buys real throughput while
attention stays exact bf16 flash.

Scheme (standard dynamic PTQ, no calibration data needed):
- weights: symmetric per-output-channel int8, quantized once offline
  (``quantize_weight``);
- activations: symmetric per-token dynamic int8 — each token row is
  scaled by its own abs-max at runtime (one cheap VPU pass that XLA
  fuses into the surrounding elementwise work).

Accuracy is bounded by tests (tests/test_quant.py) rather than claimed:
per-token dynamic quantization tracks the bf16 reference closely on
LayerNormed transformer activations (which are range-controlled by
construction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-output-channel int8 weight quantization.

    w: [K, N] float -> (w_q int8 [K, N], scale fp32 [N]) with
    w ~= w_q * scale."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, eps) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                eps: float = 1e-8) -> jnp.ndarray:
    """Dynamically quantized matmul: x [..., K] @ (w_q [K, N] * w_scale [N]).

    Per-token symmetric activation quantization; the contraction runs
    s8 x s8 -> s32 on the MXU (preferred_element_type), the rescale is a
    fused elementwise epilogue.  Returns x.dtype."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, eps) / 127.0
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s_x * w_scale)).astype(x.dtype)


# param-tree conversion -------------------------------------------------

_QUANT_MODULES = ("Wqkv", "out_proj", "fc1", "fc2")


def quantize_tree(params, module_names=_QUANT_MODULES):
    """Convert a trained fp32/bf16 param tree to the int8 serving layout.

    Every 2-D ``kernel`` directly under a module named in *module_names*
    becomes {kernel_q: int8, scale: fp32}; biases and everything else pass
    through.  The result matches the params of the same model constructed
    with ``quant=True`` (nn/layers.py QuantDense keeps the module names, so
    checkpoints stay mechanically mappable)."""
    if not isinstance(params, dict):
        return params
    out = {}
    for name, sub in params.items():
        if (name in module_names and isinstance(sub, dict)
                and "kernel" in sub and getattr(sub["kernel"], "ndim", 0) == 2):
            w_q, scale = quantize_weight(sub["kernel"])
            q = {"kernel_q": w_q, "scale": scale}
            if "bias" in sub:
                q["bias"] = sub["bias"]
            out[name] = q
        else:
            out[name] = quantize_tree(sub, module_names)
    return out
