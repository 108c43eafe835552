"""CLI regression smokes (tiny models, 1-2 steps) — lock the entry-point
wiring that manual drives validated."""

import os

import numpy as np
import pytest


def test_pretrain_cli_smoke(tmp_path):
    from octcubem_tpu.cli import pretrain

    out = str(tmp_path / "pt")
    pretrain.main(["--synthetic", "--tiny", "--epochs", "1",
                   "--batch_size", "8", "--steps_per_epoch", "1",
                   "--output_dir", out])
    assert os.path.exists(os.path.join(out, "log.txt"))
    assert os.path.exists(os.path.join(out, "all_image_dict-0.pkl"))
    assert os.path.isdir(os.path.join(out, "ckpt", "0"))


def test_finetune_cli_smoke(tmp_path):
    from octcubem_tpu.cli import finetune

    out = str(tmp_path / "ft")
    res = finetune.main(["--synthetic", "--tiny", "--epochs", "1",
                         "--batch_size", "8", "--synthetic_n", "20",
                         "--output_dir", out])
    assert len(res) == 1
    assert os.path.exists(os.path.join(out, "macro_metrics_val.csv"))


def test_infer_cli_smoke(tmp_path):
    from octcubem_tpu.data.dicom import write_dicom
    from octcubem_tpu.cli import infer

    vol = (np.random.default_rng(0).random((12, 64, 64)) * 255).astype(np.uint8)
    p = str(tmp_path / "v.dcm")
    write_dicom(p, vol)
    probs = infer.main([p, "--num_frames", "6", "--input_size", "32",
                        "--nb_classes", "4"])
    assert probs.shape == (2, 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)
