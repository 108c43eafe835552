"""MAE-3D encoder/decoder output parity vs an independent torch oracle.

mask_ratio=0 (identity permutation) so the RNG-free eval path is compared;
this still exercises the full encoder, the in-forward bicubic pooling of
the high-res spatial pos embed, the decoder unshuffle, and decoder_pred.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp
import pytest

from octcubem_tpu.models import mae3d
from octcubem_tpu.compat.torch_import import import_state_dict

D, DD = 32, 16
HEADS, DHEADS = 2, 2
DEPTH, DDEPTH = 2, 1
FRAMES, TP, IMG, HIMG, P = 6, 3, 32, 64, 16
TGRID = FRAMES // TP
GRID, HGRID = IMG // P, HIMG // P
PRED_T = 6
U = TP * PRED_T // FRAMES  # t_pred_patch_size


def _rand(rng, *shape):
    return torch.tensor(rng.standard_normal(shape).astype(np.float32) * 0.05)


def make_mae_state_dict(seed=0):
    rng = np.random.default_rng(seed)
    sd = {
        "cls_token": _rand(rng, 1, 1, D),
        "decoder_cls_token": _rand(rng, 1, 1, DD),
        "pos_embed_spatial": _rand(rng, 1, HGRID * HGRID, D),
        "pos_embed_temporal": _rand(rng, 1, TGRID, D),
        "pos_embed_class": _rand(rng, 1, 1, D),
        "decoder_pos_embed_spatial": _rand(rng, 1, HGRID * HGRID, DD),
        "decoder_pos_embed_temporal": _rand(rng, 1, TGRID, DD),
        "decoder_pos_embed_class": _rand(rng, 1, 1, DD),
        "patch_embed.proj.weight": _rand(rng, D, 1, TP, P, P),
        "patch_embed.proj.bias": _rand(rng, D),
        "high_res_patch_embed.proj.weight": _rand(rng, D, 1, TP, P, P),
        "high_res_patch_embed.proj.bias": _rand(rng, D),
        "norm.weight": torch.ones(D) + _rand(rng, D),
        "norm.bias": _rand(rng, D),
        "decoder_embed.weight": _rand(rng, DD, D),
        "decoder_embed.bias": _rand(rng, DD),
        "mask_token": _rand(rng, 1, 1, DD),
        "decoder_norm.weight": torch.ones(DD) + _rand(rng, DD),
        "decoder_norm.bias": _rand(rng, DD),
        "decoder_pred.weight": _rand(rng, U * P * P * 1, DD),
        "decoder_pred.bias": _rand(rng, U * P * P * 1),
    }
    def blocks(prefix, depth, d):
        for i in range(depth):
            pre = f"{prefix}.{i}."
            sd[pre + "norm1.weight"] = torch.ones(d) + _rand(rng, d)
            sd[pre + "norm1.bias"] = _rand(rng, d)
            sd[pre + "mixer.Wqkv.weight"] = _rand(rng, 3 * d, d)
            sd[pre + "mixer.Wqkv.bias"] = _rand(rng, 3 * d)
            sd[pre + "mixer.out_proj.weight"] = _rand(rng, d, d)
            sd[pre + "mixer.out_proj.bias"] = _rand(rng, d)
            sd[pre + "norm2.weight"] = torch.ones(d) + _rand(rng, d)
            sd[pre + "norm2.bias"] = _rand(rng, d)
            sd[pre + "mlp.fc1.weight"] = _rand(rng, 4 * d, d)
            sd[pre + "mlp.fc1.bias"] = _rand(rng, 4 * d)
            sd[pre + "mlp.fc2.weight"] = _rand(rng, d, 4 * d)
            sd[pre + "mlp.fc2.bias"] = _rand(rng, d)
    blocks("blocks", DEPTH, D)
    blocks("decoder_blocks", DDEPTH, DD)
    return sd


def _torch_blocks(sd, prefix, depth, heads, x):
    """Two-stream flash-semantics stack; returns last MLP branch output."""
    b, n, d = x.shape
    residual = None
    for i in range(depth):
        pre = f"{prefix}.{i}."
        residual = x if residual is None else x + residual
        h1 = F.layer_norm(residual, (d,), sd[pre + "norm1.weight"],
                          sd[pre + "norm1.bias"], eps=1e-6)
        qkv = F.linear(h1, sd[pre + "mixer.Wqkv.weight"],
                       sd[pre + "mixer.Wqkv.bias"])
        qkv = qkv.reshape(b, n, 3, heads, d // heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = ((q @ k.transpose(-2, -1)) * (d // heads) ** -0.5).softmax(-1)
        ctx = (att @ v).transpose(1, 2).reshape(b, n, d)
        residual = F.linear(ctx, sd[pre + "mixer.out_proj.weight"],
                            sd[pre + "mixer.out_proj.bias"]) + residual
        h2 = F.layer_norm(residual, (d,), sd[pre + "norm2.weight"],
                          sd[pre + "norm2.bias"], eps=1e-6)
        x = F.linear(F.gelu(F.linear(h2, sd[pre + "mlp.fc1.weight"],
                                     sd[pre + "mlp.fc1.bias"])),
                     sd[pre + "mlp.fc2.weight"], sd[pre + "mlp.fc2.bias"])
    return x


def torch_mae_pred(sd, x):
    """x: [B, C, T, H, W], mask_ratio=0. Returns decoder prediction."""
    high_res = x.shape[-1] == HIMG
    key = "high_res_patch_embed" if high_res else "patch_embed"
    feat = F.conv3d(x, sd[key + ".proj.weight"], sd[key + ".proj.bias"],
                    stride=(TP, P, P))
    b, d, t, h, w = feat.shape
    feat = torch.einsum("ncts->ntsc", feat.flatten(3)).reshape(b, t * h * w, d)

    if high_res:
        pos_spat = sd["pos_embed_spatial"]
    else:
        pos_spat = F.interpolate(
            sd["pos_embed_spatial"].view(1, HGRID, HGRID, -1).permute(0, 3, 1, 2),
            [GRID, GRID], mode="bicubic", align_corners=False,
        ).permute(0, 2, 3, 1).view(1, GRID * GRID, -1)
    if t == 1:
        pos = pos_spat
    else:
        pos = pos_spat.repeat(1, t, 1) + torch.repeat_interleave(
            sd["pos_embed_temporal"], h * w, dim=1)
    xx = torch.cat([sd["cls_token"].expand(b, -1, -1), feat], 1)
    pos = torch.cat([sd["pos_embed_class"], pos], 1)
    xx = xx + pos

    xx = _torch_blocks(sd, "blocks", DEPTH, HEADS, xx)
    xx = F.layer_norm(xx, (d,), sd["norm.weight"], sd["norm.bias"], eps=1e-6)
    latent = xx[:, 1:]

    # decoder
    z = F.linear(latent, sd["decoder_embed.weight"], sd["decoder_embed.bias"])
    if high_res:
        dpos_spat = sd["decoder_pos_embed_spatial"]
    else:
        dpos_spat = F.interpolate(
            sd["decoder_pos_embed_spatial"].view(1, HGRID, HGRID, -1).permute(0, 3, 1, 2),
            [GRID, GRID], mode="bicubic", align_corners=False,
        ).permute(0, 2, 3, 1).view(1, GRID * GRID, -1)
    if t == 1:
        dpos = dpos_spat
    else:
        dpos = dpos_spat.repeat(1, TGRID, 1) + torch.repeat_interleave(
            sd["decoder_pos_embed_temporal"], h * w, dim=1)
    z = torch.cat([sd["decoder_cls_token"].expand(b, -1, -1), z], 1)
    dpos = torch.cat([sd["decoder_pos_embed_class"], dpos], 1)
    z = z + dpos
    z = _torch_blocks(sd, "decoder_blocks", DDEPTH, DHEADS, z)
    z = F.layer_norm(z, (DD,), sd["decoder_norm.weight"],
                     sd["decoder_norm.bias"], eps=1e-6)
    z = F.linear(z, sd["decoder_pred.weight"], sd["decoder_pred.bias"])
    return z[:, 1:]


def _build_model():
    return mae3d.MaskedAutoencoderViT3D(
        input_size=IMG, high_res_input_size=HIMG, patch_size=P, in_chans=1,
        embed_dim=D, depth=DEPTH, num_heads=HEADS, decoder_embed_dim=DD,
        decoder_depth=DDEPTH, decoder_num_heads=DHEADS, num_frames=FRAMES,
        t_patch_size=TP, pred_t_dim=PRED_T, attn_impl="naive", parity="flash")


@pytest.mark.slow  # full-model torch parity; fast importer cover in test_torch_parity.py
@pytest.mark.parametrize("res", ["low", "high2d"])
def test_mae_pred_parity(res):
    sd = make_mae_state_dict()
    model = _build_model()
    if res == "low":
        x_np = np.random.default_rng(1).standard_normal(
            (2, 1, FRAMES, IMG, IMG)).astype(np.float32)
    else:  # 2D co-training input: T = t_patch replicated frames, high-res
        frame = np.random.default_rng(2).standard_normal(
            (2, 1, 1, HIMG, HIMG)).astype(np.float32)
        x_np = np.repeat(frame, TP, axis=2)

    ref = torch_mae_pred(sd, torch.tensor(x_np)).detach().numpy()

    x_jax = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))
    template = model.init(
        {"params": jax.random.key(0), "masking": jax.random.key(1)},
        jnp.zeros((1, FRAMES, IMG, IMG, 1)), mask_ratio=0.75)
    params, report = import_state_dict(
        template, {k: v.numpy() for k, v in sd.items()})
    assert not report["missing"], report
    _, _, pred, _ = model.apply(params, x_jax, mask_ratio=0.0)
    np.testing.assert_allclose(np.asarray(pred), ref, atol=2e-5, rtol=2e-5)


def _torch_patchify(imgs, u, p):
    """Reference patchify layout (models_mae_joint_res_flash_attn.py:
    289-314): token order (t, h, w), within-patch order (u, p, q, c)."""
    B, C, T, H, W = imgs.shape
    tt, hh, ww = T // u, H // p, W // p
    x = imgs.reshape(B, C, tt, u, hh, p, ww, p)
    return x.permute(0, 2, 4, 6, 3, 5, 7, 1).reshape(B, tt * hh * ww,
                                                     u * p * p * C)


@pytest.mark.parametrize("norm_pix", [False, True])
def test_loss_pred_t_dim_subsample_golden(norm_pix):
    """The pred_t_dim < num_frames loss branch (the case it exists for):
    target frames subsampled by index_select(linspace(0, T-1,
    pred_t_dim).long()) — reference models_mae_joint_res_flash_attn.py:
    630-642 — then masked MSE + per-frame SPL losses (:649-661).
    num_frames=12 / t_patch=2 / pred_t_dim=6 gives u=1 and truncating
    indices [0,2,4,6,8,11], so a rounding mismatch fails loudly.
    norm_pix=True additionally pins torch's UNBIASED variance (:644-646).
    """
    FR, TPS, PT = 12, 2, 6
    model = mae3d.MaskedAutoencoderViT3D(
        input_size=IMG, high_res_input_size=HIMG, patch_size=P, in_chans=1,
        embed_dim=D, depth=1, num_heads=2, decoder_embed_dim=DD,
        decoder_depth=1, decoder_num_heads=2, num_frames=FR,
        t_patch_size=TPS, pred_t_dim=PT, attn_impl="naive",
        norm_pix_loss=norm_pix)
    assert model.t_pred_patch_size == 1  # 2*6//12

    rng = np.random.default_rng(7)
    x_np = rng.standard_normal((2, FR, IMG, IMG, 1)).astype(np.float32)
    x = jnp.asarray(x_np)
    params = jax.jit(
        lambda k, x: model.init({"params": k, "masking": k}, x,
                                mask_ratio=0.75))(jax.random.key(0), x)
    loss, frame_losses, pred, mask = jax.jit(
        lambda p, x, k: model.apply(p, x, mask_ratio=0.75,
                                    rngs={"masking": k})
    )(params, x, jax.random.key(2))

    # torch oracle for the loss given the SAME pred/mask
    imgs_t = torch.tensor(x_np.transpose(0, 4, 1, 2, 3))  # [B,C,T,H,W]
    idx = torch.linspace(0, FR - 1, PT).long()
    assert idx.tolist() == [0, 2, 4, 6, 8, 11]  # truncation, not rounding
    target = _torch_patchify(torch.index_select(imgs_t, 2, idx), 1, P)
    if norm_pix:
        mean = target.mean(dim=-1, keepdim=True)
        var = target.var(dim=-1, keepdim=True)  # torch default: unbiased
        target = (target - mean) / (var + 1e-6) ** 0.5
    pred_t = torch.tensor(np.asarray(pred, np.float32))
    l = ((pred_t - target) ** 2).mean(-1)
    m = torch.tensor(np.asarray(mask, np.float32)).view(l.shape)
    loss_ref = float((l * m).sum() / m.sum())
    gr = IMG // P
    rl = l.view(-1, FR // TPS, gr, gr)
    rm = m.view(-1, FR // TPS, gr, gr)
    fl_ref = ((rl * rm).sum(dim=(2, 3)) / (rm.sum(dim=(2, 3)) + 1e-6)).numpy()

    np.testing.assert_allclose(float(loss), loss_ref, rtol=2e-5)
    assert frame_losses.shape == (2, FR // TPS)
    np.testing.assert_allclose(np.asarray(frame_losses), fl_ref, rtol=2e-5,
                               atol=1e-6)
