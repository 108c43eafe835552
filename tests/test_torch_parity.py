"""Output parity: import a reference-shaped PyTorch state dict and verify
our model reproduces the reference forward bit-for-bit (fp32).

The torch-side forward below is an independent re-implementation of the
reference semantics (flash-attn two-stream blocks incl. the no-final-
residual quirk, sep pos embeds, global-pool-without-norm dropout head) used
purely as a numerical oracle.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp
import pytest

from octcubem_tpu.models import vit_st
from octcubem_tpu.compat.torch_import import import_state_dict

D, HEADS, DEPTH = 32, 2, 2
FRAMES, TP, IMG, P = 6, 3, 32, 16
NCLS = 4
TGRID, GRID = FRAMES // TP, IMG // P
L = GRID * GRID


def _rand(rng, *shape):
    return torch.tensor(rng.standard_normal(shape).astype(np.float32) * 0.05)


def make_reference_state_dict(seed=0, head_type="dropout", dims=None):
    D, HEADS, DEPTH = dims or (globals()["D"], globals()["HEADS"],
                               globals()["DEPTH"])
    rng = np.random.default_rng(seed)
    sd = {
        "cls_token": _rand(rng, 1, 1, D),
        "pos_embed_spatial": _rand(rng, 1, L, D),
        "pos_embed_temporal": _rand(rng, 1, TGRID, D),
        "pos_embed_class": _rand(rng, 1, 1, D),
        "patch_embed.proj.weight": _rand(rng, D, 1, TP, P, P),
        "patch_embed.proj.bias": _rand(rng, D),
        "norm.weight": torch.ones(D) + _rand(rng, D),
        "norm.bias": _rand(rng, D),
        "head.weight": _rand(rng, NCLS, D),
        "head.bias": _rand(rng, NCLS),
    }
    for i in range(DEPTH):
        pre = f"blocks.{i}."
        sd[pre + "norm1.weight"] = torch.ones(D) + _rand(rng, D)
        sd[pre + "norm1.bias"] = _rand(rng, D)
        sd[pre + "mixer.Wqkv.weight"] = _rand(rng, 3 * D, D)
        sd[pre + "mixer.Wqkv.bias"] = _rand(rng, 3 * D)
        sd[pre + "mixer.out_proj.weight"] = _rand(rng, D, D)
        sd[pre + "mixer.out_proj.bias"] = _rand(rng, D)
        sd[pre + "norm2.weight"] = torch.ones(D) + _rand(rng, D)
        sd[pre + "norm2.bias"] = _rand(rng, D)
        sd[pre + "mlp.fc1.weight"] = _rand(rng, 4 * D, D)
        sd[pre + "mlp.fc1.bias"] = _rand(rng, 4 * D)
        sd[pre + "mlp.fc2.weight"] = _rand(rng, D, 4 * D)
        sd[pre + "mlp.fc2.bias"] = _rand(rng, D)
    if head_type == "aggregate":
        sd["fc_aggregate_cls.weight"] = _rand(rng, D, D)
        sd["fc_aggregate_cls.bias"] = _rand(rng, D)
        sd["aggregate_cls_norm.weight"] = torch.ones(D) + _rand(rng, D)
        sd["aggregate_cls_norm.bias"] = _rand(rng, D)
    return sd


def torch_reference_forward(sd, x, head_type="dropout", dims=None):
    """x: [B, C, T, H, W]; reference flash-attn semantics, eval mode."""
    D, HEADS, DEPTH = dims or (globals()["D"], globals()["HEADS"],
                               globals()["DEPTH"])
    feat = F.conv3d(x, sd["patch_embed.proj.weight"],
                    sd["patch_embed.proj.bias"], stride=(TP, P, P))
    b, d, t, h, w = feat.shape
    feat = feat.flatten(3)
    feat = torch.einsum("ncts->ntsc", feat).reshape(b, t * h * w, d)
    xx = torch.cat([sd["cls_token"].expand(b, -1, -1), feat], 1)
    pos = sd["pos_embed_spatial"].repeat(1, t, 1) + torch.repeat_interleave(
        sd["pos_embed_temporal"], h * w, dim=1)
    pos = torch.cat([sd["pos_embed_class"], pos], 1)
    xx = xx + pos

    residual = None
    for i in range(DEPTH):
        pre = f"blocks.{i}."
        residual = xx if residual is None else xx + residual
        h1 = F.layer_norm(residual, (d,), sd[pre + "norm1.weight"],
                          sd[pre + "norm1.bias"], eps=1e-6)
        qkv = F.linear(h1, sd[pre + "mixer.Wqkv.weight"],
                       sd[pre + "mixer.Wqkv.bias"])
        n = qkv.shape[1]
        qkv = qkv.reshape(b, n, 3, HEADS, d // HEADS).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * (d // HEADS) ** -0.5
        att = att.softmax(dim=-1)
        ctx = (att @ v).transpose(1, 2).reshape(b, n, d)
        attn_out = F.linear(ctx, sd[pre + "mixer.out_proj.weight"],
                            sd[pre + "mixer.out_proj.bias"])
        residual = attn_out + residual
        h2 = F.layer_norm(residual, (d,), sd[pre + "norm2.weight"],
                          sd[pre + "norm2.bias"], eps=1e-6)
        mlp = F.linear(F.gelu(F.linear(h2, sd[pre + "mlp.fc1.weight"],
                                       sd[pre + "mlp.fc1.bias"])),
                       sd[pre + "mlp.fc2.weight"], sd[pre + "mlp.fc2.bias"])
        xx = mlp  # two-stream output; final residual add intentionally absent

    pooled = xx[:, 1:, :].mean(dim=1)
    if head_type == "aggregate":
        pooled = F.layer_norm(pooled, (d,), sd["norm.weight"],
                              sd["norm.bias"], eps=1e-6)
        pooled = F.linear(pooled, sd["fc_aggregate_cls.weight"],
                          sd["fc_aggregate_cls.bias"])
        pooled = F.layer_norm(pooled, (d,), sd["aggregate_cls_norm.weight"],
                              sd["aggregate_cls_norm.bias"], eps=1e-6)
        pooled = F.gelu(pooled)
    # dropout variant: reference skips the norm on the pooled feature
    return F.linear(pooled, sd["head.weight"], sd["head.bias"])


@pytest.mark.parametrize("head_type", ["dropout", "aggregate"])
def test_vit_st_output_parity(head_type):
    sd = make_reference_state_dict(head_type=head_type)
    model = vit_st.VisionTransformerST(
        num_frames=FRAMES, t_patch_size=TP, img_size=IMG, patch_size=P,
        in_chans=1, num_classes=NCLS, embed_dim=D, depth=DEPTH,
        num_heads=HEADS, head_type=head_type, global_pool=True,
        sep_pos_embed=True, cls_embed=True, attn_impl="naive",
        parity="flash",
    )
    x_np = np.random.default_rng(42).standard_normal(
        (2, 1, FRAMES, IMG, IMG)).astype(np.float32)

    ref = torch_reference_forward(
        {k: v for k, v in sd.items()}, torch.tensor(x_np), head_type
    ).detach().numpy()

    x_jax = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))  # channel-last
    template = model.init(jax.random.key(0), x_jax)
    params, report = import_state_dict(
        template, {k: v.numpy() for k, v in sd.items()})
    assert not report["missing"], report
    ours = np.asarray(model.apply(params, x_jax))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_vit_st_output_parity_vitl_scale():
    """Parity at real ViT-L width/depth (1024 x 24, 16 heads) — the tiny
    oracle can hide drift that only shows at production dims; spatial
    dims stay small so the fp32 CPU run remains tractable
    (VERDICT round-1 item 10)."""
    dims = (1024, 16, 24)
    sd = make_reference_state_dict(head_type="aggregate", dims=dims)
    model = vit_st.VisionTransformerST(
        num_frames=FRAMES, t_patch_size=TP, img_size=IMG, patch_size=P,
        in_chans=1, num_classes=NCLS, embed_dim=1024, depth=24,
        num_heads=16, head_type="aggregate", global_pool=True,
        sep_pos_embed=True, cls_embed=True, attn_impl="naive",
        parity="flash",
    )
    x_np = np.random.default_rng(7).standard_normal(
        (2, 1, FRAMES, IMG, IMG)).astype(np.float32)
    ref = torch_reference_forward(sd, torch.tensor(x_np), "aggregate",
                                  dims=dims).detach().numpy()
    x_jax = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))
    template = model.init(jax.random.key(0), x_jax)
    params, report = import_state_dict(
        template, {k: v.numpy() for k, v in sd.items()})
    assert not report["missing"], report
    ours = np.asarray(model.apply(params, x_jax))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_parity_check_cli_roundtrip(tmp_path):
    """The parity harness (cli/parity_check.py) passes on an
    oracle-generated .pth + expected-logits npz pair — the exact flow it
    will run against released checkpoints when artifacts appear."""
    from octcubem_tpu.cli import parity_check

    sd = make_reference_state_dict(head_type="dropout")
    x_np = np.random.default_rng(3).standard_normal(
        (2, 1, FRAMES, IMG, IMG)).astype(np.float32)
    expected = torch_reference_forward(sd, torch.tensor(x_np),
                                       "dropout").detach().numpy()
    pth = str(tmp_path / "ckpt.pth")
    torch.save({"model": sd}, pth)
    npz = str(tmp_path / "expected.npz")
    np.savez(npz, inputs=x_np, expected_logits=expected)

    rc = parity_check.main([
        pth, npz, "--model_family", "vit_st_dropout",
        "--num_frames", str(FRAMES), "--input_size", str(IMG),
        "--t_patch_size", str(TP), "--num_classes", str(NCLS),
        "--embed_dim", str(D), "--depth", str(DEPTH),
        "--num_heads", str(HEADS), "--atol", "1e-4"])
    assert rc == 0

    # corrupted expectations must FAIL (the harness actually compares)
    np.savez(npz, inputs=x_np, expected_logits=expected + 1.0)
    rc = parity_check.main([
        pth, npz, "--model_family", "vit_st_dropout",
        "--num_frames", str(FRAMES), "--input_size", str(IMG),
        "--t_patch_size", str(TP), "--num_classes", str(NCLS),
        "--embed_dim", str(D), "--depth", str(DEPTH),
        "--num_heads", str(HEADS), "--atol", "1e-4"])
    assert rc == 1


@pytest.mark.slow  # spatial+temporal interp builds two ViT-scale trees
# (~12s); fast import cover: test_import_fuses_separate_qkv + the
# parity_check CLI roundtrip
def test_import_interpolates_pos_embeds():
    """Checkpoint at 6 frames/32px loads into a 12-frame model with temporal
    interpolation, and spatial interp for a larger grid."""
    sd = make_reference_state_dict()
    model = vit_st.VisionTransformerST(
        num_frames=12, t_patch_size=TP, img_size=48, patch_size=P,
        in_chans=1, num_classes=NCLS, embed_dim=D, depth=DEPTH,
        num_heads=HEADS, head_type="dropout", attn_impl="naive",
    )
    x = jnp.zeros((1, 12, 48, 48, 1))
    template = model.init(jax.random.key(0), x)
    params, report = import_state_dict(
        template, {k: v.numpy() for k, v in sd.items()})
    assert not report["missing"]
    p = params["params"]
    assert p["pos_embed_temporal"].shape == (1, 4, D)
    assert p["pos_embed_spatial"].shape == (1, 9, D)


def test_import_fuses_separate_qkv():
    """Non-flash checkpoints (attn.q/k/v + attn.proj) are fused to Wqkv."""
    sd = make_reference_state_dict()
    # rewrite block 0/1 into non-flash naming
    for i in range(DEPTH):
        pre = f"blocks.{i}."
        w = sd.pop(pre + "mixer.Wqkv.weight")
        b = sd.pop(pre + "mixer.Wqkv.bias")
        for j, n in enumerate("qkv"):
            sd[pre + f"attn.{n}.weight"] = w[j * D:(j + 1) * D]
            sd[pre + f"attn.{n}.bias"] = b[j * D:(j + 1) * D]
        sd[pre + "attn.proj.weight"] = sd.pop(pre + "mixer.out_proj.weight")
        sd[pre + "attn.proj.bias"] = sd.pop(pre + "mixer.out_proj.bias")

    model = vit_st.VisionTransformerST(
        num_frames=FRAMES, t_patch_size=TP, img_size=IMG, patch_size=P,
        in_chans=1, num_classes=NCLS, embed_dim=D, depth=DEPTH,
        num_heads=HEADS, head_type="dropout", attn_impl="naive",
    )
    x_np = np.random.default_rng(7).standard_normal(
        (1, 1, FRAMES, IMG, IMG)).astype(np.float32)
    ref = torch_reference_forward(
        make_reference_state_dict(), torch.tensor(x_np)).detach().numpy()
    template = model.init(jax.random.key(0), jnp.zeros((1, FRAMES, IMG, IMG, 1)))
    params, report = import_state_dict(
        template, {k: v.numpy() for k, v in sd.items()})
    assert not report["missing"]
    ours = np.asarray(model.apply(
        params, jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
