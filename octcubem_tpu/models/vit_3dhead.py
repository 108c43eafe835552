"""RETFound-all baseline: 2D ViT over every slice + 3D pooling head.

Parity target: OCTCube/models_vit_3dhead_flash_attn.py:40-112 — runs the
2D trunk on [B*N] slices, mean-pools slice embeddings, then
fc_aggregate_cls -> aggregate_cls_norm -> head.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..nn.layers import LN_EPS
from .vit2d import VisionTransformer2D


class VisionTransformer3DHead(nn.Module):
    num_classes: int = 16
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    drop_path_rate: float = 0.0
    global_pool: bool = True
    parity: str = "flash"
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    def setup(self):
        self.trunk = VisionTransformer2D(
            img_size=self.img_size, patch_size=self.patch_size,
            in_chans=self.in_chans, num_classes=0, embed_dim=self.embed_dim,
            depth=self.depth, num_heads=self.num_heads,
            drop_path_rate=self.drop_path_rate, global_pool=self.global_pool,
            parity=self.parity, dtype=self.dtype, attn_impl=self.attn_impl,
            remat=self.remat)
        self.fc_aggregate_cls = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.aggregate_cls_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32)
        self.head = nn.Dense(self.num_classes, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.02))

    def forward_features(self, x, deterministic: bool = True):
        """x: [B, N, H, W, C] (N slices) -> [B, D]."""
        b, n, h, w, c = x.shape
        x = x.reshape(b * n, h, w, c)
        feat = self.trunk.forward_features(x, deterministic)
        feat = feat.reshape(b, n, -1).mean(axis=1)
        feat = self.fc_aggregate_cls(feat)
        feat = self.aggregate_cls_norm(feat)
        return feat

    def __call__(self, x, deterministic: bool = True):
        return self.head(self.forward_features(x, deterministic))

    def lock_groups(self) -> list[list[str]]:
        """Mirror of reference lock() groups (models_vit_3dhead_flash_attn
        .py:67-102)."""
        first = ["trunk/patch_embed", "trunk/pos_embed", "trunk/cls_token"]
        groups = [first]
        groups += [[f"trunk/blocks/blocks_{i}"] for i in range(self.depth - 1)]
        groups += [[f"trunk/blocks/blocks_{self.depth - 1}", "trunk/fc_norm",
                    "trunk/norm"]]
        groups += [["fc_aggregate_cls", "aggregate_cls_norm", "head"]]
        return groups


def vit_large_patch16(**kw) -> VisionTransformer3DHead:
    return VisionTransformer3DHead(patch_size=16, embed_dim=1024, depth=24,
                                   num_heads=16, **kw)
