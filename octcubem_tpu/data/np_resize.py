"""Host-side (numpy) resize using the same exact torch-kernel matrices as
ops/resize.py — ingestion workers must never touch the accelerator, so the
numpy path shares `_interp_matrix_1d` with the jittable device path for
bit-consistent results."""

from __future__ import annotations

import numpy as np

from ..ops.resize import _interp_matrix_1d


def resize_trilinear_np(vol: np.ndarray, out_thw: tuple[int, int, int]) -> np.ndarray:
    """[..., T, H, W] linear resize per axis (torch trilinear exact)."""
    t, h, w = vol.shape[-3:]
    ot, oh, ow = out_thw
    vol = vol.astype(np.float32, copy=False)
    if t != ot:
        vol = np.einsum("Tt,...thw->...Thw",
                        _interp_matrix_1d(t, ot, "linear").astype(np.float32), vol,
                        optimize=True)
    if h != oh:
        vol = np.einsum("Hh,...thw->...tHw",
                        _interp_matrix_1d(h, oh, "linear").astype(np.float32), vol,
                        optimize=True)
    if w != ow:
        vol = np.einsum("Ww,...thw->...thW",
                        _interp_matrix_1d(w, ow, "linear").astype(np.float32), vol,
                        optimize=True)
    return vol


def resize_bilinear_np(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """[..., H, W] bilinear resize (torch mode='bilinear' exact)."""
    h, w = img.shape[-2:]
    oh, ow = out_hw
    img = img.astype(np.float32, copy=False)
    if h != oh:
        img = np.einsum("Hh,...hw->...Hw",
                        _interp_matrix_1d(h, oh, "linear").astype(np.float32), img,
                        optimize=True)
    if w != ow:
        img = np.einsum("Ww,...hw->...hW",
                        _interp_matrix_1d(w, ow, "linear").astype(np.float32), img,
                        optimize=True)
    return img


def resize_bicubic_np(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """[..., H, W] bicubic resize (torch mode='bicubic', A=-0.75 exact)."""
    h, w = img.shape[-2:]
    oh, ow = out_hw
    img = img.astype(np.float32, copy=False)
    if h != oh:
        img = np.einsum("Hh,...hw->...Hw",
                        _interp_matrix_1d(h, oh, "cubic").astype(np.float32), img,
                        optimize=True)
    if w != ow:
        img = np.einsum("Ww,...hw->...hW",
                        _interp_matrix_1d(w, ow, "cubic").astype(np.float32), img,
                        optimize=True)
    return img
