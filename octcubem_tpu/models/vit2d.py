"""2D ViT classifier (RETFound-style baseline).

Parity targets: OCTCube/models_vit.py (timm VisionTransformer with
global-pool + fc_norm applied to the center B-scan) and
OCTCube/models_vit_flash_attn.py.  Uses flat learned pos embed with cls
token (timm convention), flash-parity block semantics for the *_flash_attn
checkpoints and 'standard' for the timm ones.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..nn.layers import TransformerStack, LN_EPS
from ..nn.patch_embed import PatchEmbed2D


class VisionTransformer2D(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 0
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    global_pool: bool = True
    parity: str = "standard"
    capture_cam: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    # int8 serving path: block projections via QuantDense (ops/quant.py);
    # params come from ops.quant.quantize_tree on a trained checkpoint
    quant: bool = False

    def setup(self):
        self.patch_embed = PatchEmbed2D(
            self.img_size, self.patch_size, self.in_chans, self.embed_dim,
            dtype=self.dtype)
        n = self.patch_embed.num_patches + 1
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, n, self.embed_dim))
        self.blocks = TransformerStack(
            self.depth, self.embed_dim, self.num_heads, self.mlp_ratio,
            self.qkv_bias, self.drop_path_rate, dtype=self.dtype,
            attn_impl=self.attn_impl, parity=self.parity, remat=self.remat,
            quant=self.quant, capture_cam=self.capture_cam)
        # global_pool uses fc_norm and DELETES norm; cls path keeps norm
        # only (models_vit.py:22-33 `del self.norm`) — checkpoints contain
        # exactly one of the two
        if self.global_pool:
            self.fc_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32)
        else:
            self.norm = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32)
        if self.num_classes > 0:
            self.head = nn.Dense(self.num_classes, dtype=self.dtype,
                                 kernel_init=nn.initializers.normal(0.02))

    def forward_features(self, x, deterministic: bool = True):
        """x: [B, H, W, C] -> [B, D]."""
        b = x.shape[0]
        x = self.patch_embed(x)
        cls = jnp.broadcast_to(
            self.cls_token.astype(x.dtype), (b, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        x = self.blocks(x, deterministic)
        if self.global_pool:
            return self.fc_norm(x[:, 1:, :].mean(axis=1))
        return self.norm(x)[:, 0]

    def __call__(self, x, deterministic: bool = True):
        feat = self.forward_features(x, deterministic)
        if self.num_classes > 0:
            return self.head(feat)
        return feat


def vit_large_patch16(**kw) -> VisionTransformer2D:
    return VisionTransformer2D(patch_size=16, embed_dim=1024, depth=24,
                               num_heads=16, **kw)


def vit_base_patch16(**kw) -> VisionTransformer2D:
    return VisionTransformer2D(patch_size=16, embed_dim=768, depth=12,
                               num_heads=12, **kw)


def vit_huge_patch14(**kw) -> VisionTransformer2D:
    return VisionTransformer2D(patch_size=14, embed_dim=1280, depth=32,
                               num_heads=16, **kw)
