"""variable_joint dual-resolution fine-tune path.

Reference: models_vit_st_joint_flash_attn.py:74-120 (joint model) +
main_finetune_downstream_inhouse_singlefold.py:84-85,269-276 (dual-res
dataset/transforms).  The reference engine's own forward call is defective
(engine_finetune.py:433-435 passes the high-res batch as the hidden_states
flag of a single-input forward — default-off dead code); the rebuild
implements the documented intent: (low, high) sample pairs, alternating
resolution streams through the joint model's dispatch.
"""

import pytest
import numpy as np

pytestmark = pytest.mark.slow  # heavy CLI/e2e drives: -m 'not slow' skips


def _write_png(path, rng, size=48):
    from PIL import Image

    arr = (rng.random((size, size)) * 255).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(path)


def test_dataset_returns_both_res(tmp_path):
    from octcubem_tpu.data import patients, transforms
    from octcubem_tpu.data.loader import _collate

    rng = np.random.default_rng(0)
    for p in range(2):
        d = tmp_path / f"p{p}" / "v0"
        d.mkdir(parents=True)
        for t in range(6):
            _write_png(str(d / f"oct_{t:03d}.png"), rng)
    visits = patients.scan_directory(str(tmp_path))
    _, label_fn = patients.build_labels(visits, "multi_label",
                                        disease_list=("AMD",))
    lo_t, _ = transforms.create_3d_transforms(32, 6)
    hi_t, _ = transforms.create_3d_transforms(64, 6)
    ds = patients.PatientDataset3D(
        visits, label_fn, max_frames=6, transform=lo_t,
        return_both_res_image=True, high_res_transform=hi_t,
        high_res_max_frames=6)
    (lo, hi), _lab = ds[0]
    assert lo.shape == (6, 32, 32, 1)
    assert hi.shape == (6, 64, 64, 1)
    # nested-tuple collation keeps the pair structure batched
    (blo, bhi), blab = _collate([ds[0], ds[1]])
    assert blo.shape == (2, 6, 32, 32, 1)
    assert bhi.shape == (2, 6, 64, 64, 1)
    assert blab.shape[0] == 2


def test_joint_model_trains_both_streams():
    """Alternating low/high-res steps (the cli/finetune.py variable_joint
    schedule) trains BOTH patch embeds of the joint model."""
    import jax
    import jax.numpy as jnp

    from octcubem_tpu.models.vit_st import VisionTransformerST
    from octcubem_tpu.train import losses, optim, schedules
    from octcubem_tpu.train.finetune_engine import make_finetune_train_step
    from octcubem_tpu.train.train_state import TrainState

    model = VisionTransformerST(
        num_frames=6, t_patch_size=3, img_size=32, in_chans=1,
        num_classes=4, embed_dim=32, depth=2, num_heads=2,
        high_res_input_size=64, attn_impl="naive", parity="standard")
    rng = jax.random.key(0)
    lo = jax.random.normal(rng, (2, 6, 32, 32, 1))
    hi = jax.random.normal(rng, (2, 6, 64, 64, 1))
    params = model.init(jax.random.key(1), lo)
    # init on the low-res stream still materializes the high-res embed
    assert "high_res_patch_embed" in params["params"]

    sched = schedules.warmup_half_cosine(1e-2, 0.0, 0, 1, 10)
    tx = optim.build_adamw(params, sched, weight_decay=0.0)
    state = TrainState.create(params, tx, jax.random.key(2))
    crit = losses.make_criterion("multi_cls")
    step = make_finetune_train_step(model, tx, crit)
    y = jnp.zeros((2,), jnp.int32)

    # host copies: the train step donates the state buffers
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    state, m_lo = step(state, lo, y)   # low-res stream
    state, m_hi = step(state, hi, y)   # high-res stream
    assert np.isfinite(float(m_lo["loss"]))
    assert np.isfinite(float(m_hi["loss"]))

    def delta(path):
        a, b = p0["params"][path]["kernel"], state.params["params"][path]["kernel"]
        return float(jnp.abs(a - b).max())

    assert delta("patch_embed") > 0
    assert delta("high_res_patch_embed") > 0


def test_finetune_cli_variable_joint(tmp_path):
    """End-to-end: the CLI drives dual-res k-fold fine-tune over a fixture
    PNG tree — paired loader batches, alternating train streams, eval on
    the high-res stream."""
    import os

    from octcubem_tpu.cli import finetune

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    # 20 patients -> 10 land in the train split (2-fold), >= the 8-device
    # CPU mesh batch requirement
    for p in range(20):
        d = data / f"p{p:02d}" / "v0"
        d.mkdir(parents=True)
        for t in range(6):
            _write_png(str(d / f"oct_{t:03d}.png"), rng)
    out = str(tmp_path / "ft")
    res = finetune.main(["--tiny", "--variable_joint", "--epochs", "2",
                         "--batch_size", "8", "--data_dir", str(data),
                         "--output_dir", out])
    assert len(res) == 1
    assert os.path.exists(os.path.join(out, "macro_metrics_val.csv"))
