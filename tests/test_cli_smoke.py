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


def _write_png(path, rng, size=40):
    from PIL import Image

    arr = (rng.random((size, size)) * 255).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(path)


def test_pretrain_cli_real_joint_data(tmp_path):
    """Joint pretrain over a real (fixture) PNG patient tree + a
    Kermany-style image folder: the 2D SPL dataset is frames+Kermany,
    hardness is written back keyed by the 3D batch's frame paths, and
    SPL reselects the top-K across epochs
    (main_pretrain_oph_joint_2d512_flash_attn.py:313-330,668-687)."""
    import pickle

    from octcubem_tpu.cli import pretrain

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    for p in range(8):  # >= the 8-device CPU test mesh
        d = data / f"p{p}" / "v0"
        d.mkdir(parents=True)
        for t in range(6):
            _write_png(str(d / f"oct_{t:03d}.png"), rng)
    kermany = tmp_path / "kermany"
    for cls in ("NORMAL", "CNV"):
        d = kermany / cls
        d.mkdir(parents=True)
        for i in range(3):
            _write_png(str(d / f"k{i}.png"), rng)

    out = str(tmp_path / "pt")
    pretrain.main(["--data_dir", str(data), "--kermany_dir", str(kermany),
                   "--tiny", "--epochs", "2", "--batch_size", "8",
                   "--output_dir", out])

    with open(os.path.join(out, "all_image_dict-1.pkl"), "rb") as f:
        hard = pickle.load(f)
    # dict keyed by real paths: 8 visits x 6 frames + 6 kermany images
    assert len(hard) == 54
    assert any("kermany" in k for k in hard)
    # the 3D batch's frame losses were written back by frame path
    visited = [k for k, v in hard.items() if v["visited"] > 0]
    assert visited and all(str(data) in k for k in visited)
    assert all(hard[k]["hardness"] > 0 for k in visited)


def test_finetune_cli_smoke(tmp_path):
    from octcubem_tpu.cli import finetune

    out = str(tmp_path / "ft")
    res = finetune.main(["--synthetic", "--tiny", "--epochs", "1",
                         "--batch_size", "8", "--synthetic_n", "20",
                         "--output_dir", out])
    assert len(res) == 1
    assert os.path.exists(os.path.join(out, "macro_metrics_val.csv"))


def test_retclip_cli_smoke_accum_heldout(tmp_path):
    """octcube_ir preset semantics through the CLI: accum_freq=4
    feature-cached accumulation (effective batch = batch*4,
    train_IR_512-MAE3D-nodrop-vit-large.sh:21-50) and retrieval R@k
    computed on the held-out val split, not the train set."""
    import json

    from octcubem_tpu.cli import retclip

    out = str(tmp_path / "rc")
    retclip.main(["--preset", "octcube_ir",
                  "--model_config", "vitl16_octcube_ir_tiny_test",
                  "--synthetic", "--synthetic_n", "48",
                  "--batch_size", "8", "--epochs", "1",
                  "--output_dir", out])
    with open(os.path.join(out, "results.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert rows and "image_to_enface_R@1" in rows[-1]
    # val split: 48 * 0.2 = 9 held-out pairs scored
    assert rows[-1]["image_to_enface_R@1"] >= 0.0


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


def test_predict_cli_smoke(tmp_path):
    """Batch-inference CLI: PNG patient tree -> predictions CSV +
    embeddings npz, with the one-batch-deep dispatch pipeline and a
    padded tail batch (3 volumes, batch 2)."""
    import numpy as np
    from PIL import Image

    from octcubem_tpu.cli import predict

    rng = np.random.default_rng(5)
    data = tmp_path / "vols"
    for p in range(3):
        d = data / f"p{p}" / "v0"
        d.mkdir(parents=True)
        for t in range(6):
            arr = (rng.random((40, 40)) * 255).astype(np.uint8)
            Image.fromarray(arr, "L").save(str(d / f"oct_{t:03d}.png"))
    out_csv = str(tmp_path / "preds.csv")
    emb_npz = str(tmp_path / "emb.npz")
    rows = predict.main([str(data), "--out_csv", out_csv,
                         "--batch_size", "2", "--num_frames", "6",
                         "--input_size", "32", "--nb_classes", "4",
                         "--embed_dim", "32", "--depth", "2",
                         "--num_heads", "2",
                         "--dump_embeddings", emb_npz])
    assert len(rows) == 3
    assert os.path.exists(out_csv)
    emb = np.load(emb_npz)
    assert emb["embeddings"].shape[0] == 3
    import csv as _csv

    with open(out_csv) as f:
        r = list(_csv.reader(f))
    assert len(r) == 4 and r[0][0] == "patient_id"
    assert all(np.isfinite(float(v)) for v in r[1][1:])
