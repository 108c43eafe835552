import os

import numpy as np
import pytest

from octcubem_tpu.data.crossmodal import MedMNIST3DDataset, EchoNetDataset
from octcubem_tpu import native


def test_medmnist_reader(tmp_path):
    rng = np.random.default_rng(0)
    np.savez(tmp_path / "nodule.npz",
             train_images=(rng.random((5, 28, 28, 28)) * 255).astype(np.uint8),
             train_labels=rng.integers(0, 2, (5, 1)),
             val_images=(rng.random((2, 28, 28, 28)) * 255).astype(np.uint8),
             val_labels=rng.integers(0, 2, (2, 1)))
    ds = MedMNIST3DDataset(str(tmp_path / "nodule.npz"), "train",
                           num_frames=16, input_size=32)
    assert len(ds) == 5
    vol, y = ds[0]
    assert vol.shape == (16, 32, 32, 1)
    assert y in (0, 1)


def test_echonet_reader(tmp_path):
    cv2 = pytest.importorskip("cv2")
    os.makedirs(tmp_path / "Videos")
    rng = np.random.default_rng(0)
    path = str(tmp_path / "Videos" / "v0.avi")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 64))
    for _ in range(12):
        wr.write((rng.random((64, 64, 3)) * 255).astype(np.uint8))
    wr.release()
    with open(tmp_path / "FileList.csv", "w") as f:
        f.write("FileName,EF,Split\nv0,55.3,TRAIN\n")
    ds = EchoNetDataset(str(tmp_path), "TRAIN", num_frames=8, input_size=32)
    assert len(ds) == 1
    vol, ef = ds[0]
    assert vol.shape == (8, 32, 32, 1)
    # regression labels are standardized like the reference
    # (USDataset3D.py:20-37: (EF - 60.0) / 12.371483)
    assert abs(ef - (55.3 - 60.0) / 12.371483) < 1e-5
    raw = EchoNetDataset(str(tmp_path), "TRAIN", num_frames=8,
                         input_size=32, standardize=False)
    assert abs(raw[0][1] - 55.3) < 1e-5


def test_native_loader_matches_pil(tmp_path):
    """Native C++ PNG stack decode must match the PIL reference path
    (incl. the PIL-bicubic 1024->512 downsample) within uint8 rounding."""
    if not native.available():
        pytest.skip("native toolchain unavailable")
    from PIL import Image
    from octcubem_tpu.data import ingest

    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        arr = (rng.random((96, 1024)) * 255).astype(np.uint8)
        p = str(tmp_path / f"oct_{i:03d}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    vol_native = native.load_png_stack_native(paths)
    # force the PIL fallback
    import octcubem_tpu.native as nat
    saved = nat._lib, nat._build_failed
    nat._lib, nat._build_failed = None, True
    try:
        vol_pil = ingest.load_frame_stack(paths)
    finally:
        nat._lib, nat._build_failed = saved
    assert vol_native.shape == vol_pil.shape == (4, 96, 512)
    # PIL quantizes with its own fixed-point coefficients; agree to within
    # 2 uint8 steps everywhere and tiny mean error
    assert np.abs(vol_native - vol_pil).max() <= 2.5 / 255
    assert np.abs(vol_native - vol_pil).mean() < 0.5 / 255


@pytest.mark.slow
def test_slivit_forward():
    import os as _os
    _os.environ.setdefault("XLA_FLAGS", "")
    import jax
    from octcubem_tpu.models.slivit import SLIViT

    m = SLIViT(num_patches=4, num_classes=2, slice_size=64)
    x = jax.random.normal(jax.random.key(0), (1, 4, 64, 64, 1))
    p = m.init(jax.random.key(1), x)
    out = m.apply(p, x)
    assert out.shape == (1, 2)
    assert np.isfinite(np.asarray(out)).all()
