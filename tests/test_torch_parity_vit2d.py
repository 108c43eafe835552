"""2D ViT (RETFound / COEM enface trunk) output parity vs a torch oracle,
in both block semantics (standard timm and flash two-stream)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp
import pytest

from octcubem_tpu.models import vit2d
from octcubem_tpu.compat.torch_import import import_state_dict

D, HEADS, DEPTH, IMG, P = 32, 2, 2, 32, 16
L = (IMG // P) ** 2


def _rand(rng, *shape):
    return torch.tensor(rng.standard_normal(shape).astype(np.float32) * 0.05)


def make_sd(seed=0):
    rng = np.random.default_rng(seed)
    sd = {
        "cls_token": _rand(rng, 1, 1, D),
        "pos_embed": _rand(rng, 1, L + 1, D),
        "patch_embed.proj.weight": _rand(rng, D, 3, P, P),
        "patch_embed.proj.bias": _rand(rng, D),
        # global_pool checkpoints carry fc_norm only (norm is deleted)
        "fc_norm.weight": torch.ones(D) + _rand(rng, D),
        "fc_norm.bias": _rand(rng, D),
        "head.weight": _rand(rng, 4, D),
        "head.bias": _rand(rng, 4),
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
    return sd


def torch_forward(sd, x, parity):
    """x: [B, 3, H, W]; global_pool + fc_norm head (models_vit.py:22-55 /
    models_vit_flash_attn.py)."""
    feat = F.conv2d(x, sd["patch_embed.proj.weight"],
                    sd["patch_embed.proj.bias"], stride=P)
    b, d, h, w = feat.shape
    feat = feat.flatten(2).transpose(1, 2)
    xx = torch.cat([sd["cls_token"].expand(b, -1, -1), feat], 1)
    xx = xx + sd["pos_embed"]
    residual = None
    for i in range(DEPTH):
        pre = f"blocks.{i}."
        if parity == "flash":
            residual = xx if residual is None else xx + residual
            base = residual
        else:
            base = xx
        h1 = F.layer_norm(base, (d,), sd[pre + "norm1.weight"],
                          sd[pre + "norm1.bias"], eps=1e-6)
        qkv = F.linear(h1, sd[pre + "mixer.Wqkv.weight"],
                       sd[pre + "mixer.Wqkv.bias"])
        n = qkv.shape[1]
        qkv = qkv.reshape(b, n, 3, HEADS, d // HEADS).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = ((q @ k.transpose(-2, -1)) * (d // HEADS) ** -0.5).softmax(-1)
        ctx = (att @ v).transpose(1, 2).reshape(b, n, d)
        attn_out = F.linear(ctx, sd[pre + "mixer.out_proj.weight"],
                            sd[pre + "mixer.out_proj.bias"])
        if parity == "flash":
            residual = attn_out + residual
            base2 = residual
        else:
            xx = base + attn_out
            base2 = xx
        h2 = F.layer_norm(base2, (d,), sd[pre + "norm2.weight"],
                          sd[pre + "norm2.bias"], eps=1e-6)
        mlp = F.linear(F.gelu(F.linear(h2, sd[pre + "mlp.fc1.weight"],
                                       sd[pre + "mlp.fc1.bias"])),
                       sd[pre + "mlp.fc2.weight"], sd[pre + "mlp.fc2.bias"])
        if parity == "flash":
            xx = mlp
        else:
            xx = base2 + mlp
    pooled = xx[:, 1:, :].mean(dim=1)
    pooled = F.layer_norm(pooled, (d,), sd["fc_norm.weight"],
                          sd["fc_norm.bias"], eps=1e-6)
    return F.linear(pooled, sd["head.weight"], sd["head.bias"])


@pytest.mark.parametrize("parity", ["standard", "flash"])
def test_vit2d_parity(parity):
    sd = make_sd()
    model = vit2d.VisionTransformer2D(
        img_size=IMG, patch_size=P, in_chans=3, num_classes=4, embed_dim=D,
        depth=DEPTH, num_heads=HEADS, global_pool=True, parity=parity,
        attn_impl="naive")
    x_np = np.random.default_rng(3).standard_normal(
        (2, 3, IMG, IMG)).astype(np.float32)
    ref = torch_forward(sd, torch.tensor(x_np), parity).detach().numpy()
    tpl = model.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
    params, report = import_state_dict(tpl, {k: v.numpy() for k, v in sd.items()})
    assert not report["missing"], report
    ours = np.asarray(model.apply(
        params, jnp.asarray(x_np.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
