"""Interpolation expressed as matrix multiplication (TPU-native resize).

The reference model calls ``torch.nn.functional.interpolate(mode='bicubic',
align_corners=False)`` *inside the forward pass* to pool the high-res learned
positional embedding down to the low-res grid (reference:
Pre-training/models_mae_joint_res_flash_attn.py:419-421), and again at
checkpoint-load time for grid-size changes (reference:
OCTCube/util/pos_embed.py:71-140).  PyTorch's bicubic uses the Keys cubic
convolution kernel with A = -0.75 and border clamping; ``jax.image.resize``
uses A = -0.5, so it does NOT reproduce those values.

Instead of a gather-based resampler we build the (out_size, in_size)
interpolation matrix once (it is tiny — pos-embed grids are <= 32x32) and
apply it with einsum.  This is exact w.r.t. the PyTorch kernel, fully static,
and runs on the MXU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel, matches torch's bicubic (A = -0.75)."""
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    w = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def _interp_matrix_1d(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix.

    Reproduces torch.nn.functional.interpolate with align_corners=False,
    antialias=False for mode in {'cubic', 'linear'} (including the
    border-clamp behaviour: out-of-range taps are accumulated onto the edge
    samples).
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float64)
    scale = in_size / out_size
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        # source coordinate of output sample i (align_corners=False)
        src = (i + 0.5) * scale - 0.5
        if mode == "cubic":
            base = int(np.floor(src))
            taps = np.arange(base - 1, base + 3)
            w = _cubic_kernel(src - taps)
        elif mode == "linear":
            base = int(np.floor(src))
            taps = np.arange(base, base + 2)
            w = 1.0 - np.abs(src - taps)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        idx = np.clip(taps, 0, in_size - 1)
        for j, wj in zip(idx, w):
            mat[i, j] += wj
    return mat


def resize_grid_bicubic(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bicubic-resize the (H, W) leading-of-last-3 grid of ``x``.

    x: [..., H, W, D]  ->  [..., H', W', D]   (torch-bicubic exact)
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    mh = jnp.asarray(_interp_matrix_1d(h, oh, "cubic"), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix_1d(w, ow, "cubic"), dtype=x.dtype)
    x = jnp.einsum("Hh,...hwd->...Hwd", mh, x)
    x = jnp.einsum("Ww,...hwd->...hWd", mw, x)
    return x


def resize_seq_linear(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Linear-resize along the second-to-last axis.

    x: [..., T, D] -> [..., T', D]   (torch mode='linear' exact)

    Used for temporal pos-embed interpolation (reference:
    OCTCube/util/pos_embed.py:109-140).
    """
    t = x.shape[-2]
    if t == out_len:
        return x
    mt = jnp.asarray(_interp_matrix_1d(t, out_len, "linear"), dtype=x.dtype)
    return jnp.einsum("Tt,...td->...Td", mt, x)


def resize_volume_trilinear(x: jnp.ndarray, out_thw: tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear-resize a volume: [..., T, H, W] -> [..., T', H', W'].

    Equivalent to MONAI/torch ``interpolate(mode='trilinear',
    align_corners=False)`` — the val-transform resize used by the reference
    data pipeline (reference: OCTCube/util/PatientDataset.py:37-65).
    Expressed as three small matmuls so the whole ingestion graph jits.
    """
    t, h, w = x.shape[-3], x.shape[-2], x.shape[-1]
    ot, oh, ow = out_thw
    if (t, h, w) == (ot, oh, ow):
        return x
    mtm = jnp.asarray(_interp_matrix_1d(t, ot, "linear"), dtype=x.dtype)
    mhm = jnp.asarray(_interp_matrix_1d(h, oh, "linear"), dtype=x.dtype)
    mwm = jnp.asarray(_interp_matrix_1d(w, ow, "linear"), dtype=x.dtype)
    x = jnp.einsum("Tt,...thw->...Thw", mtm, x)
    x = jnp.einsum("Hh,...thw->...tHw", mhm, x)
    x = jnp.einsum("Ww,...thw->...thW", mwm, x)
    return x
