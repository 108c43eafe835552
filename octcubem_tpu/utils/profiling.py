"""FLOPs / parameter profiling.

Parity target: retinal-COEM/src/training/profile.py (fvcore
FlopCountAnalysis + ActivationCountAnalysis over the model registry, CSV
output).  TPU-native version: XLA's own cost analysis from the compiled
executable (exact, includes fusion effects) plus an analytic transformer
FLOPs counter, and jax.profiler trace capture for timeline inspection.
"""

from __future__ import annotations

import csv
from typing import Callable

import jax
import numpy as np


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def xla_cost_analysis(fn: Callable, *args) -> dict:
    """Compile fn and return XLA's cost analysis (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return dict(cost or {})


def vit_flops(n_tokens: int, depth: int, d: int, mlp_ratio: float = 4.0) -> float:
    """Analytic fwd FLOPs of a pre-LN ViT stack (matmul terms)."""
    lin = 2 * n_tokens * (4 + 2 * mlp_ratio) * d * d
    attn = 4 * n_tokens * n_tokens * d
    return depth * (lin + attn)


def profile_models(entries: list[tuple[str, Callable, tuple]],
                   csv_path: str | None = None) -> list[dict]:
    """entries: [(name, fn, example_args)]. Returns per-model rows with
    params, XLA flops, and bytes; optionally writes a CSV like the
    reference profiler."""
    rows = []
    for name, fn, args in entries:
        cost = xla_cost_analysis(fn, *args)
        rows.append({
            "model": name,
            "flops_G": round(float(cost.get("flops", 0)) / 1e9, 3),
            "bytes_accessed_MB": round(
                float(cost.get("bytes accessed", 0)) / 1e6, 2),
        })
    if csv_path and rows:
        with open(csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
    return rows


def trace(fn: Callable, *args, log_dir: str = "/tmp/jax_trace"):
    """Capture a jax.profiler trace of one fn invocation."""
    with jax.profiler.trace(log_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    return log_dir
