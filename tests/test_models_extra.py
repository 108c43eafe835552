import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octcubem_tpu.models import mae2d, vit_st
from octcubem_tpu.compat.torch_import import (
    convert_retfound_2d_state_dict, import_state_dict)


@pytest.mark.slow  # ViT-L-scale build/forward; full-suite only
def test_mae2d_forward():
    m = mae2d.MaskedAutoencoderViT2D(
        img_size=32, patch_size=16, in_chans=3, embed_dim=32, depth=2,
        num_heads=2, decoder_embed_dim=16, decoder_depth=1,
        decoder_num_heads=2, attn_impl="naive")
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    params = m.init({"params": jax.random.key(1), "masking": jax.random.key(2)},
                    x, mask_ratio=0.75)
    loss, per_image, pred, mask = m.apply(
        params, x, mask_ratio=0.75, rngs={"masking": jax.random.key(3)})
    assert np.isfinite(float(loss))
    assert per_image.shape == (2,)
    assert pred.shape == (2, 4, 16 * 16 * 3)
    # unpatchify roundtrip
    rec = m.apply(params, pred, method=m.unpatchify)
    assert rec.shape == (2, 32, 32, 3)


def test_vit_st_joint_high_res_dispatch():
    m = vit_st.VisionTransformerST(
        num_frames=6, t_patch_size=3, img_size=32, patch_size=16, in_chans=1,
        num_classes=4, embed_dim=32, depth=2, num_heads=2,
        high_res_input_size=64, attn_impl="naive")
    x_lo = jnp.ones((1, 6, 32, 32, 1))
    x_hi = jnp.ones((1, 6, 64, 64, 1))
    params = m.init(jax.random.key(0), x_lo)
    p = params["params"]
    # pos embed stored at the high-res grid
    assert p["pos_embed_spatial"].shape == (1, 16, 32)
    assert "high_res_patch_embed" in p
    out_lo = m.apply(params, x_lo)
    out_hi = m.apply(params, x_hi)
    assert out_lo.shape == out_hi.shape == (1, 4)


def test_retfound_2d_to_3d_conversion():
    rng = np.random.default_rng(0)
    d = 32
    sd = {
        "cls_token": rng.standard_normal((1, 1, d)).astype(np.float32),
        "pos_embed": rng.standard_normal((1, 197, d)).astype(np.float32),
        "patch_embed.proj.weight": rng.standard_normal(
            (d, 1, 16, 16)).astype(np.float32),
        "patch_embed.proj.bias": rng.standard_normal(d).astype(np.float32),
    }
    out = convert_retfound_2d_state_dict(sd, t_patch_size=3, target_grid=4)
    assert out["pos_embed_spatial"].shape == (1, 16, d)
    assert out["pos_embed_class"].shape == (1, 1, d)
    w = out["patch_embed.proj.weight"]
    assert w.shape == (d, 1, 3, 16, 16)
    # inflation: sum over t equals the 2D kernel
    np.testing.assert_allclose(w.sum(axis=2), sd["patch_embed.proj.weight"],
                               rtol=1e-6)
    assert "high_res_patch_embed.proj.weight" in out


def test_retfound_loads_into_mae3d():
    from octcubem_tpu.models import mae3d
    rng = np.random.default_rng(1)
    d = 32
    m = mae3d.MaskedAutoencoderViT3D(
        input_size=32, high_res_input_size=64, patch_size=16, in_chans=1,
        embed_dim=d, depth=1, num_heads=2, decoder_embed_dim=16,
        decoder_depth=1, decoder_num_heads=2, num_frames=6, t_patch_size=3,
        pred_t_dim=6, attn_impl="naive")
    sd = {
        "cls_token": rng.standard_normal((1, 1, d)).astype(np.float32),
        "pos_embed": rng.standard_normal((1, 197, d)).astype(np.float32),
        "patch_embed.proj.weight": rng.standard_normal(
            (d, 1, 16, 16)).astype(np.float32),
        "patch_embed.proj.bias": rng.standard_normal(d).astype(np.float32),
        "blocks.0.norm1.weight": np.ones(d, np.float32),
        "blocks.0.norm1.bias": np.zeros(d, np.float32),
        "blocks.0.attn.qkv.weight": rng.standard_normal(
            (3 * d, d)).astype(np.float32),
        "blocks.0.attn.qkv.bias": np.zeros(3 * d, np.float32),
        "blocks.0.attn.proj.weight": rng.standard_normal(
            (d, d)).astype(np.float32),
        "blocks.0.attn.proj.bias": np.zeros(d, np.float32),
        "blocks.0.norm2.weight": np.ones(d, np.float32),
        "blocks.0.norm2.bias": np.zeros(d, np.float32),
        "blocks.0.mlp.fc1.weight": rng.standard_normal(
            (4 * d, d)).astype(np.float32),
        "blocks.0.mlp.fc1.bias": np.zeros(4 * d, np.float32),
        "blocks.0.mlp.fc2.weight": rng.standard_normal(
            (d, 4 * d)).astype(np.float32),
        "blocks.0.mlp.fc2.bias": np.zeros(d, np.float32),
        "norm.weight": np.ones(d, np.float32),
        "norm.bias": np.zeros(d, np.float32),
    }
    converted = convert_retfound_2d_state_dict(
        sd, t_patch_size=3, target_grid=m.high_res_grid)
    tpl = m.init({"params": jax.random.key(0), "masking": jax.random.key(1)},
                 jnp.zeros((1, 6, 32, 32, 1)), mask_ratio=0.75)
    params, report = import_state_dict(tpl, converted, strict=False)
    # encoder fully mapped; decoder/temporal params legitimately missing
    assert "blocks.blocks_0.mixer.Wqkv.kernel" not in report["missing"]
    assert any("decoder" in k for k in report["missing"])
    loss, _, _, _ = m.apply(params, jnp.ones((1, 6, 32, 32, 1)),
                            mask_ratio=0.5, rngs={"masking": jax.random.key(2)})
    assert np.isfinite(float(loss))


@pytest.mark.slow  # ViT-L-scale build/forward; full-suite only
def test_slivit_baseline_factory():
    """registry 'slivit' family: slivit_baseline builds a configurable
    trunk (model_slivit_baseline.py:18-92) and forwards [B,N,H,W,1]."""
    from octcubem_tpu.models import registry

    m = registry.create_model(
        "slivit", "slivit_baseline", num_classes=2, num_frames=4,
        img_size=32, slivit_depth=1, convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 8, 8, 16))
    x = jax.random.normal(jax.random.key(0), (2, 4, 32, 32, 1))
    p = m.init(jax.random.key(1), x)
    out = m.apply(p, x)
    assert out.shape == (2, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_st_slivit_head():
    from octcubem_tpu.models.slivit import ViTSTWithSLIViTHead
    m = ViTSTWithSLIViTHead(
        num_classes=3, slivit_depth=2,
        trunk_kwargs=dict(num_frames=6, t_patch_size=3, img_size=32,
                          patch_size=16, in_chans=1, embed_dim=32, depth=2,
                          num_heads=2, attn_impl="naive"))
    x = jax.random.normal(jax.random.key(0), (2, 6, 32, 32, 1))
    p = m.init(jax.random.key(1), x)
    out = m.apply(p, x)
    assert out.shape == (2, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_attach_labels_from_csv(tmp_path):
    from octcubem_tpu.data import patients
    csv_path = tmp_path / "labels.csv"
    csv_path.write_text("patient_id,AMD,DME\np0,1,0\np2,0,1\n")
    visits = [patients.Visit(f"p{i}", "0", ["x"]) for i in range(3)]
    matched = patients.attach_labels_from_csv(visits, str(csv_path))
    assert len(matched) == 2
    assert matched[0].labels == {"AMD": 1, "DME": 0}
    assert matched[1].labels == {"AMD": 0, "DME": 1}
