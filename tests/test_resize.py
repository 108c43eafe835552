"""resize-as-matmul must bit-match torch.nn.functional.interpolate."""

import numpy as np
import torch
import torch.nn.functional as F

from octcubem_tpu.ops.resize import (
    resize_grid_bicubic,
    resize_seq_linear,
    resize_volume_trilinear,
)


def test_bicubic_matches_torch_downsample():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 32, 32, 8)).astype(np.float32)
    ours = np.asarray(resize_grid_bicubic(x, (16, 16)))
    ref = F.interpolate(
        torch.tensor(x).permute(0, 3, 1, 2), size=(16, 16),
        mode="bicubic", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_bicubic_matches_torch_upsample():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 14, 14, 4)).astype(np.float32)
    ours = np.asarray(resize_grid_bicubic(x, (16, 16)))
    ref = F.interpolate(
        torch.tensor(x).permute(0, 3, 1, 2), size=(16, 16),
        mode="bicubic", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_linear_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 20, 16)).astype(np.float32)
    for new_len in (16, 20, 31):
        ours = np.asarray(resize_seq_linear(x, new_len))
        ref = F.interpolate(
            torch.tensor(x).permute(0, 2, 1), size=new_len,
            mode="linear", align_corners=False,
        ).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_trilinear_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 61, 24, 20)).astype(np.float32)
    ours = np.asarray(resize_volume_trilinear(x, (48, 16, 16)))
    ref = F.interpolate(
        torch.tensor(x).unsqueeze(1), size=(48, 16, 16),
        mode="trilinear", align_corners=False,
    ).squeeze(1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)
