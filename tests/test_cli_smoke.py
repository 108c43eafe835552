"""CLI regression smokes (tiny models, 1-2 steps) — lock the entry-point
wiring that manual drives validated."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy CLI/e2e drives: -m 'not slow' skips


def test_pretrain_cli_smoke(tmp_path):
    from octcubem_tpu.cli import pretrain

    out = str(tmp_path / "pt")
    pretrain.main(["--synthetic", "--synthetic_n", "32", "--tiny",
                   "--epochs", "1", "--batch_size", "8",
                   "--steps_per_epoch", "4", "--profile_steps", "1",
                   "--output_dir", out])
    assert os.path.exists(os.path.join(out, "log.txt"))
    assert os.path.exists(os.path.join(out, "all_image_dict-0.pkl"))
    assert os.path.isdir(os.path.join(out, "ckpt", "0"))
    # --profile_steps wrote a jax.profiler trace of the steady-state window
    prof = os.path.join(out, "profile")
    assert os.path.isdir(prof) and any(
        f for _, _, fs in os.walk(prof) for f in fs)


def test_pretrain_cli_2d_mode_smoke(tmp_path):
    """--mode 2d: plain 2D MAE pretraining with per-image SPL hardness
    (OCTCube/main_pretrain_oph_new.py + engine_pretrain.py:96-168)."""
    from octcubem_tpu.cli import pretrain

    out = str(tmp_path / "pt2d")
    pretrain.main(["--mode", "2d", "--synthetic", "--tiny", "--epochs", "1",
                   "--batch_size", "8", "--output_dir", out])
    assert os.path.exists(os.path.join(out, "log.txt"))
    assert os.path.exists(os.path.join(out, "all_image_dict-0.pkl"))
    assert os.path.isdir(os.path.join(out, "ckpt"))


def test_export_cli_roundtrips_pretrain_ckpt(tmp_path):
    """cli.export hands a trained orbax checkpoint back to the reference
    ecosystem: the .pth reloads through compat.torch_import into a
    fresh model with zero missing/unexpected keys and identical leaves."""
    import jax
    import jax.numpy as jnp

    from octcubem_tpu.cli import export, pretrain
    from octcubem_tpu.compat.torch_import import (import_state_dict,
                                                  load_torch_checkpoint)
    from octcubem_tpu.core.checkpoint import restore_raw

    out = str(tmp_path / "pt")
    pretrain.main(["--synthetic", "--tiny", "--epochs", "1",
                   "--batch_size", "8", "--steps_per_epoch", "1",
                   "--output_dir", out])
    pth = str(tmp_path / "export.pth")
    export.main(["--ckpt", out, "--out", pth])
    assert os.path.exists(pth)

    raw, _ = restore_raw(os.path.join(out, "ckpt"))
    trained = raw["params"]
    sd = load_torch_checkpoint(pth)
    template = jax.tree.map(lambda x: jnp.zeros_like(jnp.asarray(x)),
                            trained)
    back, rep = import_state_dict(template, sd, strict=True)
    assert rep["missing"] == [] and rep["unexpected"] == [], rep
    flat_t = {tuple(str(k) for k in p): v for p, v
              in jax.tree_util.tree_leaves_with_path(trained)}
    flat_b = {tuple(str(k) for k in p): v for p, v
              in jax.tree_util.tree_leaves_with_path(back)}
    assert set(flat_t) == set(flat_b)
    for k in flat_t:
        np.testing.assert_array_equal(np.asarray(flat_t[k]),
                                      np.asarray(flat_b[k]), err_msg=str(k))

    # the export stamps the source run's geometry (so a TPU-native
    # num_heads pretrain is identifiable on the torch side; reference
    # loaders ignore the extra key)
    import torch

    payload = torch.load(pth, map_location="cpu", weights_only=False)
    geom = payload.get("octcubem_tpu_geometry")
    assert geom and geom["num_heads"] == 16 and "model" in geom


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


def test_pretrain_resume_types(tmp_path):
    """The two resume types beyond latest-restore (reference
    main_pretrain_oph_joint_2d512_flash_attn.py:525-546):
    training_continue_reset_optim restores params only (fresh optimizer,
    epoch 0, SPL dict reload from load_spl_dir) and imagenet_ft converts
    a supervised timm 2D checkpoint, dropping the classifier head."""
    import jax
    import numpy as np
    import torch

    from octcubem_tpu.cli import pretrain

    out_a = str(tmp_path / "a")
    state_a = pretrain.main(
        ["--synthetic", "--tiny", "--epochs", "1", "--batch_size", "8",
         "--steps_per_epoch", "1", "--output_dir", out_a])

    # --- training_continue_reset_optim: params equal run A's final state,
    # optimizer/step fresh, SPL dict reloaded
    out_b = str(tmp_path / "b")
    state_b = pretrain.main(
        ["--synthetic", "--tiny", "--epochs", "0", "--batch_size", "8",
         "--output_dir", out_b, "--resume", out_a,
         "--resume_type", "training_continue_reset_optim",
         "--load_spl_dir", out_a, "--epoch_load_spl", "0"])
    la = jax.tree.leaves(state_a.params)
    lb = jax.tree.leaves(state_b.params)
    assert all(np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))
    assert int(state_b.step) == 0  # optimizer reset
    assert int(state_a.step) > 0

    # --- continuing across a DIFFERENT optimizer structure: run A saved
    # the fused-AdamW opt_state; a chain-layout run (--opt_chain) can
    # still continue its params because the restore is raw params-only,
    # not a full-TrainState template (self-review finding)
    out_b2 = str(tmp_path / "b2")
    state_b2 = pretrain.main(
        ["--synthetic", "--tiny", "--epochs", "0", "--batch_size", "8",
         "--output_dir", out_b2, "--resume", out_a,
         "--resume_type", "training_continue_reset_optim", "--opt_chain"])
    lb2 = jax.tree.leaves(state_b2.params)
    assert all(np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb2))
    assert isinstance(state_b2.opt_state, tuple)  # chain layout in force

    # --- imagenet_ft: supervised timm-style 2D ckpt (fused qkv, final
    # norm, 1000-class head + pre_logits) through the 2D->3D chain
    d, p, hid = 64, 16, 256
    rng = np.random.default_rng(3)

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype("f4"))

    sd = {"cls_token": t(1, 1, d), "pos_embed": t(1, 197, d),
          "patch_embed.proj.weight": t(d, 1, p, p),
          "patch_embed.proj.bias": t(d),
          "norm.weight": t(d), "norm.bias": t(d),
          "head.weight": t(1000, d), "head.bias": t(1000),
          "pre_logits.fc.weight": t(d, d)}
    for i in range(2):
        sd.update({
            f"blocks.{i}.norm1.weight": t(d), f"blocks.{i}.norm1.bias": t(d),
            f"blocks.{i}.attn.qkv.weight": t(3 * d, d),
            f"blocks.{i}.attn.qkv.bias": t(3 * d),
            f"blocks.{i}.attn.proj.weight": t(d, d),
            f"blocks.{i}.attn.proj.bias": t(d),
            f"blocks.{i}.norm2.weight": t(d), f"blocks.{i}.norm2.bias": t(d),
            f"blocks.{i}.mlp.fc1.weight": t(hid, d),
            f"blocks.{i}.mlp.fc1.bias": t(hid),
            f"blocks.{i}.mlp.fc2.weight": t(d, hid),
            f"blocks.{i}.mlp.fc2.bias": t(d)})
    ckpt = str(tmp_path / "imagenet_ft.pth")
    torch.save({"model": sd}, ckpt)

    out_c = str(tmp_path / "c")
    state_c = pretrain.main(
        ["--synthetic", "--tiny", "--epochs", "0", "--batch_size", "8",
         "--output_dir", out_c, "--init_ckpt", ckpt,
         "--resume_type", "imagenet_ft"])
    # conv kernel inflated over t and divided by t_patch (3), einsum layout
    w2d = sd["patch_embed.proj.weight"].numpy()
    want = (np.repeat(w2d[:, :, None], 3, axis=2) / 3).transpose(2, 3, 4, 1, 0)
    got = np.asarray(state_c.params["params"]["patch_embed"]["kernel"])
    assert np.allclose(got, want, atol=1e-6)
    # the encoder block weights arrived (fused qkv path)
    got_qkv = np.asarray(
        state_c.params["params"]["blocks"]["blocks_0"]["mixer"]["Wqkv"]["kernel"])
    assert np.allclose(got_qkv, sd["blocks.0.attn.qkv.weight"].numpy().T,
                       atol=1e-6)


def test_finetune_cli_smoke(tmp_path):
    from octcubem_tpu.cli import finetune

    out = str(tmp_path / "ft")
    res = finetune.main(["--synthetic", "--tiny", "--epochs", "1",
                         "--batch_size", "8", "--synthetic_n", "20",
                         "--output_dir", out])
    assert len(res) == 1
    assert os.path.exists(os.path.join(out, "macro_metrics_val.csv"))


def test_finetune_cli_slivit_ct3d(tmp_path):
    """SLIViT cross-modality flow (main_…diffmodal.py --slivit_exp
    --slivit_dataset ct3d): nodulemnist3d.npz fixture -> SLIViT baseline
    (tiny ConvNeXt trunk) -> multi_cls metrics over the predefined
    train/val/test splits."""
    from octcubem_tpu.cli import finetune

    rng = np.random.default_rng(0)
    npz = tmp_path / "nodulemnist3d.npz"

    def mk(n):
        return (rng.integers(0, 255, (n, 28, 28, 28), dtype=np.uint8),
                rng.integers(0, 2, (n, 1), dtype=np.int64))

    tr_i, tr_l = mk(8)
    va_i, va_l = mk(4)
    te_i, te_l = mk(4)
    np.savez(npz, train_images=tr_i, train_labels=tr_l,
             val_images=va_i, val_labels=va_l,
             test_images=te_i, test_labels=te_l)
    out = str(tmp_path / "slivit_ct3d")
    res = finetune.main(["--slivit_dataset", "ct3d", "--tiny",
                         "--data_dir", str(npz), "--epochs", "1",
                         "--batch_size", "4", "--output_dir", out])
    assert len(res) == 1
    assert os.path.exists(os.path.join(out, "macro_metrics_val.csv"))


def test_finetune_cli_slivit_us3d_regression_synthetic(tmp_path):
    """us3d (EchoNet EF) regression mode end-to-end on synthetic data:
    the slivit_us3d preset routes task_mode=regression through the SLIViT
    baseline and the pearson/R2 regression metric battery."""
    import csv

    from octcubem_tpu.cli import finetune

    out = str(tmp_path / "slivit_us3d")
    res = finetune.main(["--slivit_dataset", "us3d", "--tiny", "--synthetic",
                         "--synthetic_n", "20", "--epochs", "1",
                         "--batch_size", "4", "--output_dir", out])
    assert len(res) == 1
    path = os.path.join(out, "macro_metrics_val.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert rows and "mse" in rows[0]


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


def test_retclip_cli_resume_across_optimizer_layouts(tmp_path):
    """Resume compatibility (round-3 review finding): a full-TrainState
    resume against a DIFFERENT optimizer layout must fail with the
    actionable message (not an orbax traceback), and --resume_params_only
    must resume params across any layout change."""
    import pytest

    from octcubem_tpu.cli import retclip

    out = str(tmp_path / "rc")
    common = ["--preset", "octcube_ir",
              "--model_config", "vitl16_octcube_ir_tiny_test",
              "--synthetic", "--synthetic_n", "16",
              "--batch_size", "8", "--output_dir", out]
    retclip.main(common + ["--epochs", "1"])

    # same layout: full resume works
    retclip.main(common + ["--epochs", "2", "--resume", "latest"])

    # different layout (legacy chain optimizer): helpful SystemExit
    with pytest.raises(SystemExit, match="resume_params_only"):
        retclip.main(common + ["--epochs", "3", "--resume", "latest",
                               "--opt_chain"])

    # params-only escape works across the layout change
    retclip.main(common + ["--epochs", "1", "--resume", "latest",
                           "--opt_chain", "--resume_params_only"])


def _write_paired_tree(root, rng, n_patients, size=40, frames=6,
                       with_faf=False):
    for p in range(n_patients):
        d = root / f"p{p}" / "v0"
        d.mkdir(parents=True)
        for t in range(frames):
            _write_png(str(d / f"oct_{t:03d}.png"), rng, size)
        _write_png(str(d / "ir.png"), rng, size)
        if with_faf:
            _write_png(str(d / "faf.png"), rng, size)


def test_retclip_multiroot_and_panels(tmp_path):
    """Two data roots through one loader (AggregatedDataset,
    multimodal_dataset.py:538) + the offline evaluator rendering query /
    top-3 retrieval panels from the pkl's keys+paths
    (retDisease_eval/evaluate_results_…laterality.py:61-114)."""
    import pickle

    from octcubem_tpu.cli import retclip, retrieval_eval

    rng = np.random.default_rng(11)
    root_a, root_b = tmp_path / "siteA", tmp_path / "siteB"
    _write_paired_tree(root_a, rng, 10)
    _write_paired_tree(root_b, rng, 8)

    out = str(tmp_path / "rc")
    retclip.main(["--preset", "octcube_ir",
                  "--model_config", "vitl16_octcube_ir_tiny_test",
                  "--data_dir", str(root_a), "--data_dir", str(root_b),
                  "--batch_size", "8", "--epochs", "1",
                  "--save_retrieval_results",
                  "--output_dir", out])
    pkl = os.path.join(out, "retrieval_results_0.pkl")
    with open(pkl, "rb") as f:
        d = pickle.load(f)
    # keys row-aligned with features; every key resolves to image paths
    assert len(d["keys"]) == len(d["image"])
    assert all(k in d["paths"] for k in d["keys"])
    assert all(d["paths"][k]["enface1"] for k in d["keys"])
    # both sources contribute to the held-out split (per-source split,
    # keys prefixed with the originating dataset_idx)
    assert {k.split("/")[0] for k in d["keys"]} == {"ds0", "ds1"}
    panels = str(tmp_path / "panels")
    res = retrieval_eval.main([pkl, "--panels_dir", panels,
                               "--n_queries", "2"])
    assert res["panels_written"] == 2
    pngs = sorted(os.listdir(panels))
    assert len(pngs) == 2 and all(p.endswith(".png") for p in pngs)


def _write_ga_fixture(tmp_path, rng, name, n_patients):
    """Paired OCT+IR+FAF tree + GA-growth labels csv + manifest."""
    import csv

    from octcubem_tpu.data.multimodal import build_ga_manifest

    root = tmp_path / name
    _write_paired_tree(root, rng, n_patients, with_faf=True)
    labels_csv = str(tmp_path / f"{name}_labels.csv")
    with open(labels_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["patient_id", "ga_area",
                                          "ga_growth"])
        w.writeheader()
        for p in range(n_patients):
            w.writerow({"patient_id": f"p{p}",
                        "ga_area": round(float(rng.random() * 5), 3),
                        "ga_growth": round(float(rng.random()), 3)})
    manifest = str(tmp_path / f"{name}_manifest.csv")
    n = build_ga_manifest(str(root), manifest, labels_csv=labels_csv,
                          label_keys=["ga_area", "ga_growth"], n_splits=2)
    assert n == n_patients
    return manifest, str(root)


def test_retclip_finetune_ga_growth_end_to_end(tmp_path):
    """The real GA-growth classification fine-tune flow
    (main_retclip_finetune_more_cls_3mod.py + multimodal_dataset.py:
    1303-1496): 2-fold CV over a fixture manifest through
    OCTFAFIRClsDataset, towers initialized from a TRAINED retclip
    checkpoint (asserted), per-label best-val tracking with
    INDEPENDENT-test metrics captured at best val, engine-step reuse."""
    import json
    import pickle  # noqa: F401

    import jax

    from octcubem_tpu.cli import retclip, retclip_finetune
    from octcubem_tpu.core.checkpoint import restore_raw
    from octcubem_tpu.train import clip_engine

    rng = np.random.default_rng(23)
    manifest, parent = _write_ga_fixture(tmp_path, rng, "ga", 20)
    ind_manifest, _ = _write_ga_fixture(tmp_path, rng, "ga_ind", 8)

    # 1) train a tiny contrastive retclip run -> the pretrained towers
    rc_out = str(tmp_path / "rc")
    retclip.main(["--preset", "octcube_ir",
                  "--model_config", "vitl16_octcube_ir_tiny_test",
                  "--synthetic", "--synthetic_n", "24",
                  "--batch_size", "8", "--epochs", "1",
                  "--output_dir", rc_out])

    # params.txt must record the AS-BUILT (--model_config JSON) tower
    # geometry, not the preset's — every geometry guard trusts this file
    with open(os.path.join(rc_out, "params.txt")) as f:
        rec = json.load(f)
    assert rec["vision_cfg"]["num_heads"] == 2
    assert rec["enface_cfg"]["num_heads"] == 2
    assert rec["model"] == "vitl16_octcube_ir_tiny_test"

    # 2) manifest fine-tune, 2-fold CV, independent test set, tower init
    ft_out = str(tmp_path / "ft")
    summary = retclip_finetune.main(
        ["--manifest_csv", manifest, "--parent_dir", parent,
         "--independent_manifest_csv", ind_manifest,
         "--init_ckpt", rc_out, "--tiny",
         "--label_keys", "ga_area,ga_growth",
         "--multimodal_type", "9",  # oct3d_paired_faf_cls
         "--k_folds", "2", "--epochs", "2", "--batch_size", "8",
         "--output_dir", ft_out])

    # per-label best-val + independent-test-at-best-val populated
    assert summary["label_keys"] == ["ga_area", "ga_growth"]
    for k in range(2):
        for fi in range(2):
            assert summary["best_val"][k][fi] is not None
            assert f"r2_{k}" in summary["best_val"][k][fi]
            assert summary["independent_test_at_best_val"][0][k][fi] \
                is not None
    # results.jsonl carries independent-test metrics every epoch
    with open(os.path.join(ft_out, "results.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) == 4  # 2 folds x 2 epochs
    assert all("ind0_r2_0" in r and "val_r2_1" in r for r in rows)
    assert all(np.isfinite(r["train_loss"]) for r in rows)
    # CV registry written with per-fold best checkpoints
    with open(os.path.join(ft_out, "cv_registry.json")) as f:
        reg = json.load(f)
    assert set(reg.keys()) == {"0", "1"}

    # 3) pretrained-init asserted structurally: init_towers_from_retclip
    # copies the retclip visual tower bit-exactly into the cls params
    from octcubem_tpu.models import coem

    vcfg = dict(num_frames=6, t_patch_size=3, img_size=32, patch_size=16,
                in_chans=1, embed_dim=32, depth=2, num_heads=2)
    ecfg = dict(img_size=32, patch_size=16, in_chans=3, embed_dim=32,
                depth=2, num_heads=2)
    model = coem.COEP2TowerClassification(embed_dim=16, num_classes=2,
                                          vision_cfg=vcfg, enface_cfg=ecfg)
    img = np.zeros((1, 6, 32, 32, 1), np.float32)
    enf = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, enf)
    params2, copied = clip_engine.init_towers_from_retclip(params, rc_out)
    assert copied > 10
    raw, _ = restore_raw(os.path.join(rc_out, "ckpt"))
    src_v = jax.tree.leaves(raw["params"]["params"]["visual"])
    dst_v = jax.tree.leaves(params2["params"]["clip"]["visual"])
    ini_v = jax.tree.leaves(params["params"]["clip"]["visual"])
    assert any(not np.allclose(a, b) for a, b in zip(dst_v, ini_v))
    for a, b in zip(src_v, dst_v):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the classification head stayed fresh (not in the retclip ckpt)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(
            params2["params"]["classification_head"])[0]),
        np.asarray(jax.tree.leaves(
            params["params"]["classification_head"])[0]))


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

    # Grad-CAM overlay rendering (reference oph_vis_util CAM output)
    sal = tmp_path / "sal"
    probs2 = infer.main([p, "--num_frames", "6", "--input_size", "32",
                         "--nb_classes", "4", "--saliency_dir", str(sal)])
    np.testing.assert_allclose(probs2, probs, atol=1e-5)
    pngs = list(sal.glob("cam_*.png"))
    assert len(pngs) == 1 and pngs[0].stat().st_size > 0


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


def test_predict_cli_data_parallel_mesh(tmp_path):
    """--n_data 8: data-parallel serving over the 8-device CPU mesh must
    produce the same per-volume probabilities as the single-device path
    (params replicated, batches sharded over the mesh 'data' axis)."""
    import numpy as np
    from PIL import Image

    from octcubem_tpu.cli import predict

    rng = np.random.default_rng(7)
    data = tmp_path / "vols"
    for p in range(10):
        d = data / f"p{p}" / "v0"
        d.mkdir(parents=True)
        for t in range(6):
            arr = (rng.random((40, 40)) * 255).astype(np.uint8)
            Image.fromarray(arr, "L").save(str(d / f"oct_{t:03d}.png"))

    common = [str(data), "--num_frames", "6", "--input_size", "32",
              "--nb_classes", "4", "--embed_dim", "32", "--depth", "2",
              "--num_heads", "2"]
    rows1 = predict.main(common + ["--out_csv", str(tmp_path / "a.csv"),
                                   "--batch_size", "8"])
    rows8 = predict.main(common + ["--out_csv", str(tmp_path / "b.csv"),
                                   "--batch_size", "8", "--n_data", "8"])

    def as_dict(rows):
        return {r[0]: [float(v) for v in r[1:]] for r in rows}

    d1, d8 = as_dict(rows1), as_dict(rows8)
    assert d1.keys() == d8.keys() and len(d1) == 10
    for k in d1:
        np.testing.assert_allclose(d1[k], d8[k], rtol=1e-4, atol=1e-6)


def test_predict_cli_int8_quant(tmp_path):
    """--quant int8: the PTQ serving path (ops/quant.py) must run through
    the CLI and track the float path's probabilities."""
    import numpy as np
    from PIL import Image

    from octcubem_tpu.cli import predict

    rng = np.random.default_rng(11)
    data = tmp_path / "vols"
    for p in range(2):
        d = data / f"p{p}" / "v0"
        d.mkdir(parents=True)
        for t in range(6):
            arr = (rng.random((40, 40)) * 255).astype(np.uint8)
            Image.fromarray(arr, "L").save(str(d / f"oct_{t:03d}.png"))

    common = [str(data), "--num_frames", "6", "--input_size", "32",
              "--nb_classes", "4", "--embed_dim", "32", "--depth", "2",
              "--num_heads", "2", "--batch_size", "2"]
    rows_fp = predict.main(common + ["--out_csv", str(tmp_path / "fp.csv")])
    rows_q = predict.main(common + ["--out_csv", str(tmp_path / "q.csv"),
                                    "--quant", "int8"])
    probs_fp = np.array([[float(v) for v in r[1:]] for r in rows_fp])
    probs_q = np.array([[float(v) for v in r[1:]] for r in rows_q])
    assert np.isfinite(probs_q).all()
    np.testing.assert_allclose(probs_q, probs_fp, atol=0.05)


def test_retclip_cli_lock_image_actually_freezes(tmp_path, caplog):
    """Regression for the dead `hasattr(model, 'visual')` guard: flax
    assigns .visual in setup(), so the CLI's LiT-lock block silently
    never ran and lock_image trained every tower param.  Guarding on the
    param tree instead, the lock must fire through the CLI with real
    frozen tensors (reference lock(): models_vit_st_flash_attn_nodrop.py
    :308-351)."""
    import json
    import logging

    from octcubem_tpu.cli import retclip

    cfg_path = tmp_path / "lock_cfg.json"
    cfg_path.write_text(json.dumps({
        "lock_image": True, "lock_image_unlocked_groups": 1,
        "lock_mode": "partition", "accum_freq": 1,
    }))
    out = str(tmp_path / "rc")
    with caplog.at_level(logging.INFO):
        retclip.main(["--preset", str(cfg_path),
                      "--model_config", "vitl16_octcube_ir_tiny_test",
                      "--synthetic", "--synthetic_n", "16",
                      "--batch_size", "8", "--epochs", "1",
                      "--output_dir", out])
    lock_lines = [r.message for r in caplog.records
                  if "LiT lock" in r.message]
    assert lock_lines, "lock block never executed through the CLI"
    n_frozen = int(lock_lines[0].split(":")[1].split()[0])
    assert n_frozen > 0, lock_lines[0]


def test_predict_cli_aot_export_and_serve(tmp_path):
    """--export_aot freezes the model into a jax.export artifact; --aot
    serves from it with shapes taken from the artifact header.  The two
    serving paths must produce identical probabilities."""
    import csv as _csv

    import numpy as np
    from PIL import Image

    from octcubem_tpu.cli import predict

    rng = np.random.default_rng(11)
    data = tmp_path / "vols"
    for p in range(3):
        d = data / f"p{p}" / "v0"
        d.mkdir(parents=True)
        for t in range(6):
            arr = (rng.random((40, 40)) * 255).astype(np.uint8)
            Image.fromarray(arr, "L").save(str(d / f"oct_{t:03d}.png"))

    common = [str(data), "--num_frames", "6", "--input_size", "32",
              "--nb_classes", "4", "--embed_dim", "32", "--depth", "2",
              "--num_heads", "2", "--batch_size", "2"]
    artifact = str(tmp_path / "model.octaot")
    out = predict.main(common + ["--export_aot", artifact])
    assert out == artifact and os.path.exists(artifact)

    rows_live = predict.main(common + ["--out_csv",
                                       str(tmp_path / "live.csv")])
    # --aot ignores the CLI shape flags (header wins); pass only the few
    # the serving path still needs
    rows_aot = predict.main([str(data), "--aot", artifact,
                             "--out_csv", str(tmp_path / "aot.csv")])
    assert len(rows_live) == len(rows_aot) == 3

    def read(p):
        with open(p) as f:
            return list(_csv.reader(f))

    live, aot = read(tmp_path / "live.csv"), read(tmp_path / "aot.csv")
    assert live[0] == aot[0]
    for rl, ra in zip(live[1:], aot[1:]):
        assert rl[0] == ra[0]
        np.testing.assert_allclose([float(v) for v in rl[1:]],
                                   [float(v) for v in ra[1:]], atol=2e-4)


def test_retclip_finetune_model_config_and_lock(tmp_path):
    """Classification fine-tune built through the same JSON-config
    factory as retclip (reference create_model_and_transforms at
    main_retclip_finetune_more_cls_3mod.py:345) with a LiT-locked
    visual tower (:364-371): the manifest e2e flow passes, and the
    frozen tower params are STRUCTURALLY absent from the optimizer
    state (real partition freeze, not zero-scaling)."""
    import json

    import jax

    from octcubem_tpu.cli import retclip_finetune
    from octcubem_tpu.core.checkpoint import restore_raw

    rng = np.random.default_rng(31)
    manifest, parent = _write_ga_fixture(tmp_path, rng, "gacfg", 20)

    ft_out = str(tmp_path / "ftcfg")
    summary = retclip_finetune.main(
        ["--manifest_csv", manifest, "--parent_dir", parent,
         "--model_config", "vitl16_octcube_ir_tiny_test",
         "--lock_image", "--lock_image_unlocked_groups", "1",
         "--label_keys", "ga_area",
         "--multimodal_type", "9",
         "--k_folds", "2", "--epochs", "1", "--batch_size", "8",
         "--output_dir", ft_out])
    assert summary["label_keys"] == ["ga_area"]
    assert summary["best_val"][0][0] is not None

    with open(os.path.join(ft_out, "results.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert all(np.isfinite(r["train_loss"]) for r in rows)

    # structural freeze: the optimizer state (count + mu + nu over the
    # TRAINABLE subtree) covers strictly fewer tensors than params —
    # with unlocked_groups=1 only the tower head group + everything
    # outside clip/visual trains
    raw, _ = restore_raw(os.path.join(ft_out, "ckpt_fold0"))
    n_params = len(jax.tree.leaves(raw["params"]))
    n_opt = len(jax.tree.leaves(raw["opt_state"]))
    assert n_opt < 2 * n_params, (n_opt, n_params)

    # the tiny config's geometry (32px towers) drove the data pipeline:
    # args.json-equivalent — the out.log records the lock
    with open(os.path.join(ft_out, "out.log")) as f:
        logtext = f.read()
    assert "LiT lock" in logtext and "frozen param tensors" in logtext


def test_retclip_finetune_model_config_mode_mismatch(tmp_path):
    """A 2-tower --model_config with a 3-modality manifest mode fails
    loudly at startup instead of training a mismatched model."""
    import pytest

    from octcubem_tpu.cli import retclip_finetune

    rng = np.random.default_rng(32)
    manifest, parent = _write_ga_fixture(tmp_path, rng, "gamm", 8)
    with pytest.raises(SystemExit, match="2-tower config"):
        retclip_finetune.main(
            ["--manifest_csv", manifest, "--parent_dir", parent,
             "--model_config", "vitl16_octcube_ir_tiny_test",
             "--label_keys", "ga_area",
             "--multimodal_type", "12",  # oct3d_paired_faf_ir_cls
             "--k_folds", "2", "--epochs", "1", "--batch_size", "4",
             "--output_dir", str(tmp_path / "ftmm")])


def test_retclip_cli_aot_and_int8_retrieval_serving(tmp_path):
    """Serving parity for the retrieval path (mirrors predict/serve's
    AOT + int8 story): train a tiny retclip run, export a frozen
    encoder artifact, and evaluate with (a) the artifact and (b) live
    int8 towers — AOT metrics are identical to the live model; int8
    R@k stays within tolerance on the fixture set."""
    import json

    from octcubem_tpu.cli import retclip

    out = str(tmp_path / "rc")
    common = ["--preset", "octcube_ir",
              "--model_config", "vitl16_octcube_ir_tiny_test",
              "--synthetic", "--synthetic_n", "48", "--batch_size", "8"]
    retclip.main(common + ["--epochs", "1", "--output_dir", out])

    def last_metrics(d):
        with open(os.path.join(d, "results.jsonl")) as f:
            return [json.loads(l) for l in f][-1]

    # live fp eval of the trained weights (resume from the run above)
    live_out = str(tmp_path / "ev_live")
    retclip.main(common + ["--output_dir", out, "--resume", "latest",
                           "--resume_params_only", "--evaluate_only"])
    live = last_metrics(out)

    # export the frozen encoder artifact and evaluate through it
    art = str(tmp_path / "enc.octaot")
    ret = retclip.main(common + ["--output_dir", out, "--resume", "latest",
                                 "--resume_params_only",
                                 "--export_aot", art])
    assert ret == art and os.path.getsize(art) > 0
    aot_out = str(tmp_path / "ev_aot")
    os.makedirs(aot_out)
    retclip.main(common + ["--output_dir", out, "--resume", "latest",
                           "--resume_params_only", "--evaluate_only",
                           "--aot", art])
    aot = last_metrics(out)
    for k, v in live.items():
        if isinstance(v, float) and "R@" in k:
            assert abs(aot[k] - v) < 1e-6, (k, aot[k], v)

    # live int8 towers: retrieval quality within tolerance of fp
    retclip.main(common + ["--output_dir", out, "--resume", "latest",
                           "--resume_params_only", "--evaluate_only",
                           "--quant", "int8"])
    q = last_metrics(out)
    for k, v in live.items():
        if isinstance(v, float) and "R@" in k:
            assert abs(q[k] - v) <= 0.25, (k, q[k], v)

    # training with a serving encoder is refused
    import pytest
    with pytest.raises(SystemExit, match="evaluation-only"):
        retclip.main(common + ["--output_dir", out, "--epochs", "1",
                               "--quant", "int8"])
