"""Resume geometry guard: resuming a pretrain under different head
partitioning (or any function-changing geometry field) must fail loudly
— the param tree is identical across head counts, so the restore itself
would succeed and silently train a different function."""

import json
import os

import pytest

from octcubem_tpu.cli.pretrain import _check_resume_geometry
from octcubem_tpu.core.config import MAEPretrainConfig, load_config


def _write_args(tmp_path, **fields):
    import dataclasses

    cfg = load_config(MAEPretrainConfig, "vitl_joint_pretrain", **fields)
    p = os.path.join(tmp_path, "args.json")
    with open(p, "w") as f:
        json.dump(dataclasses.asdict(cfg), f)
    return p


def test_resume_geometry_mismatch_fails_loudly(tmp_path):
    prev = _write_args(str(tmp_path), num_heads=8, decoder_num_heads=4)
    cfg = load_config(MAEPretrainConfig, "vitl_joint_pretrain")  # 16/16
    with pytest.raises(SystemExit) as e:
        _check_resume_geometry(cfg, prev)
    msg = str(e.value)
    assert "num_heads" in msg and "decoder_num_heads" in msg


def test_resume_geometry_match_passes(tmp_path):
    prev = _write_args(str(tmp_path), num_heads=8, decoder_num_heads=4)
    cfg = load_config(MAEPretrainConfig, "vitl_mae_tpu_native_enc8")
    _check_resume_geometry(cfg, prev)  # no raise


def test_resume_geometry_tolerates_missing_file_and_old_fields(tmp_path):
    cfg = load_config(MAEPretrainConfig, "vitl_joint_pretrain")
    # no args.json at all (pre-existing ckpt dirs)
    _check_resume_geometry(cfg, os.path.join(str(tmp_path), "missing.json"))
    # pre-geometry-era args.json (fields absent): skip, don't crash
    p = os.path.join(str(tmp_path), "args.json")
    with open(p, "w") as f:
        json.dump({"epochs": 50, "batch_size": 1}, f)
    _check_resume_geometry(cfg, p)
    # benign (non-geometry) differences don't block
    prev = _write_args(str(tmp_path), accum_2d=1, epochs=3)
    _check_resume_geometry(cfg, prev)


def test_retclip_resume_tower_geometry_guard(tmp_path):
    """The retclip guard compares whole tower-cfg dicts (vision_cfg/
    enface_cfg) — a head-repartitioned tower must be refused on
    --resume latest."""
    import dataclasses

    from octcubem_tpu.core.config import (RetClipConfig,
                                          check_resume_geometry)

    fields = ("model", "embed_dim", "three_mod", "vision_cfg", "enface_cfg")
    prev_cfg = RetClipConfig()
    prev_cfg.vision_cfg["num_heads"] = 8
    p = os.path.join(str(tmp_path), "params.txt")
    with open(p, "w") as f:
        json.dump(dataclasses.asdict(prev_cfg), f)
    with pytest.raises(SystemExit) as e:
        check_resume_geometry(RetClipConfig(), p, fields)
    assert "vision_cfg" in str(e.value)
    check_resume_geometry(prev_cfg, p, fields)  # matching cfg passes


def test_torch_checkpoint_geometry_stamp_guard(tmp_path):
    """Consumers (finetune/infer/predict/serve) refuse a .pth whose
    export-time geometry stamp disagrees with the requested num_heads;
    unstamped (reference) checkpoints load unchallenged."""
    import numpy as np
    import torch

    from octcubem_tpu.compat.torch_import import check_geometry_stamp

    stamped = os.path.join(str(tmp_path), "enc8.pth")
    torch.save({"model": {"w": torch.zeros(2)},
                "octcubem_tpu_geometry": {"num_heads": 8}}, stamped)
    with pytest.raises(SystemExit) as e:
        check_geometry_stamp(stamped, 16)
    assert "num_heads=8" in str(e.value)
    check_geometry_stamp(stamped, 8)  # matching: no raise

    plain = os.path.join(str(tmp_path), "ref.pth")
    torch.save({"model": {"w": torch.zeros(2)}}, plain)
    check_geometry_stamp(plain, 16)   # unstamped: no raise
    check_geometry_stamp(os.path.join(str(tmp_path), "gone.pth"), 16)


def test_geometry_stamp_decoder_heads(tmp_path):
    """cli.pretrain --init_ckpt checks the DECODER partitioning too: the
    MAE decoder keeps training from the checkpoint, so a dec-4 export
    resumed into a 16-head decoder silently trains the wrong function."""
    import torch

    from octcubem_tpu.compat.torch_import import check_geometry_stamp

    p = os.path.join(str(tmp_path), "native.pth")
    torch.save({"model": {"w": torch.zeros(2)},
                "octcubem_tpu_geometry": {"num_heads": 16,
                                          "decoder_num_heads": 4}}, p)
    with pytest.raises(SystemExit) as e:
        check_geometry_stamp(p, 16, decoder_num_heads=16)
    assert "decoder_num_heads=4" in str(e.value)
    check_geometry_stamp(p, 16, decoder_num_heads=4)  # matching: no raise
    check_geometry_stamp(p, 16)  # decoder not consumed (classifiers): skip


def test_retclip_tower_init_refuses_stamped_geometry_mismatch(tmp_path):
    """The round-4 verdict hole: cli.retclip tower init
    (--visual_init_ckpt, reference factory loads open_clip/model.py:
    271-295) must refuse a stamped .pth whose head partitioning disagrees
    with the JSON tower config — the tensors load cleanly either way."""
    import torch

    from octcubem_tpu.cli import retclip

    stamped = os.path.join(str(tmp_path), "enc8.pth")
    torch.save({"model": {"w": torch.zeros(2)},
                "octcubem_tpu_geometry": {"num_heads": 8}}, stamped)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({"visual_init_ckpt": stamped,
                                    "accum_freq": 1}))
    out = str(tmp_path / "rc")
    with pytest.raises(SystemExit) as e:
        retclip.main(["--preset", str(cfg_path),
                      "--model_config", "vitl16_octcube_ir_tiny_test",
                      "--synthetic", "--synthetic_n", "16",
                      "--batch_size", "8", "--epochs", "1",
                      "--output_dir", out])
    assert "num_heads=8" in str(e.value)


def test_retclip_finetune_init_ckpt_run_geometry_guard(tmp_path):
    """The orbax-side twin of the .pth stamp: init_towers_from_retclip
    source runs record their tower geometry in params.txt — a head
    repartitioning must be refused (structure check can't catch it:
    Wqkv stays [D, 3D] at any head count)."""
    from octcubem_tpu.train.clip_engine import check_retclip_run_geometry

    run = tmp_path / "run"
    (run / "ckpt").mkdir(parents=True)
    vcfg16 = {"num_heads": 16, "embed_dim": 1024}
    ecfg16 = {"num_heads": 16}
    (run / "params.txt").write_text(json.dumps(
        {"vision_cfg": {"num_heads": 8}, "enface_cfg": ecfg16}))
    with pytest.raises(SystemExit) as e:
        check_retclip_run_geometry(str(run), vcfg16, ecfg16)
    assert "vision_cfg" in str(e.value)
    # the ckpt/ subdir path resolves to the same run dir
    with pytest.raises(SystemExit):
        check_retclip_run_geometry(str(run / "ckpt"), vcfg16, ecfg16)
    # matching geometry passes; enface mismatch caught independently
    check_retclip_run_geometry(str(run), {"num_heads": 8}, ecfg16)
    with pytest.raises(SystemExit) as e2:
        check_retclip_run_geometry(str(run), {"num_heads": 8},
                                   {"num_heads": 12})
    assert "enface_cfg" in str(e2.value)
    # no params.txt (foreign ckpt dir): pass unchallenged
    check_retclip_run_geometry(str(tmp_path / "elsewhere"), vcfg16, ecfg16)
    # pre-geometry-era params.txt (fields absent): skip
    (run / "params.txt").write_text(json.dumps({"epochs": 3}))
    check_retclip_run_geometry(str(run), vcfg16, ecfg16)
