"""Precision policy for TPU training.

The reference trains with fp16 AMP + a GradScaler (OCTCube/util/
misc.py:260-288).  On TPU the native mixed-precision story is bfloat16
activations/compute with fp32 params and fp32 reductions — no loss scaling
needed.  A fully-fp32 policy is kept for the bit-parity inference path.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype for softmax / layernorm / loss accumulation
    reduce_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)


FP32 = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
BF16 = Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)


def policy_from_name(name: str) -> Policy:
    return {"fp32": FP32, "bf16": BF16, "bfloat16": BF16, "float32": FP32}[name]
