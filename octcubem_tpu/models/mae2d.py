"""Plain 2D masked autoencoder (RETFound/facebook-MAE style).

Parity targets: OCTCube/models_mae.py (241 LoC — stock MAE ViT with fixed
2D sincos pos embeds, random masking, per-patch MSE with optional
norm_pix) and models_mae_flash_attn.py (same with flash blocks).  Used by
the 2D-only pretrain entry (OCTCube/main_pretrain.py,
main_pretrain_oph_new.py) and as the RETFound-compatible encoder shell.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.layers import TransformerStack, LN_EPS
from ..nn.patch_embed import PatchEmbed2D
from ..ops.masking import random_masking, gather_tokens
from ..ops.pos_embed import sincos_2d


class MaskedAutoencoderViT2D(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False
    parity: str = "standard"   # stock 2D MAE uses timm blocks
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    def setup(self):
        d, dd = self.embed_dim, self.decoder_embed_dim
        self.patch_embed = PatchEmbed2D(self.img_size, self.patch_size,
                                        self.in_chans, d, dtype=self.dtype)
        n = self.patch_embed.num_patches
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, d))
        # fixed sincos pos embeds (models_mae.py initialize_weights)
        self.pos_embed = jnp.asarray(
            sincos_2d(d, self.grid, cls_token=True))[None]
        self.decoder_pos_embed = jnp.asarray(
            sincos_2d(dd, self.grid, cls_token=True))[None]
        self.blocks = TransformerStack(
            self.depth, d, self.num_heads, self.mlp_ratio, dtype=self.dtype,
            attn_impl=self.attn_impl, parity=self.parity, remat=self.remat)
        self.norm = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32)
        self.decoder_embed = nn.Dense(dd, dtype=self.dtype)
        self.mask_token = self.param(
            "mask_token", nn.initializers.truncated_normal(0.02), (1, 1, dd))
        self.decoder_blocks = TransformerStack(
            self.decoder_depth, dd, self.decoder_num_heads, self.mlp_ratio,
            dtype=self.dtype, attn_impl=self.attn_impl, parity=self.parity,
            remat=self.remat)
        self.decoder_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32)
        self.decoder_pred = nn.Dense(
            self.patch_size ** 2 * self.in_chans, dtype=self.dtype)

    def patchify(self, imgs):
        """[B, H, W, C] -> [B, L, p*p*C] (h,w token order; p,q,c inner)."""
        b, h, w, c = imgs.shape
        p = self.patch_size
        x = imgs.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, (h // p) * (w // p), p * p * c)

    def unpatchify(self, x):
        b = x.shape[0]
        p, g, c = self.patch_size, self.grid, self.in_chans
        x = x.reshape(b, g, g, p, p, c).transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, g * p, g * p, c)

    def encode(self, x, mask_ratio: float, deterministic: bool = True):
        x = self.patch_embed(x)
        b, l, d = x.shape
        x = x + self.pos_embed[:, 1:].astype(x.dtype)
        rng = self.make_rng("masking") if mask_ratio > 0 else None
        mk = random_masking(rng, b, l, mask_ratio)
        x = gather_tokens(x, mk.ids_keep)
        cls = (self.cls_token + self.pos_embed[:, :1]).astype(x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), x], axis=1)
        x = self.blocks(x, deterministic)
        x = self.norm(x)
        return x, mk.mask, mk.ids_restore

    def decode(self, x, ids_restore, deterministic: bool = True):
        x = self.decoder_embed(x)
        b, _, c = x.shape
        l = ids_restore.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token, (b, l + 1 - x.shape[1], c)).astype(x.dtype)
        x_ = jnp.concatenate([x[:, 1:], mask_tokens], axis=1)
        x_ = gather_tokens(x_, ids_restore)
        x = jnp.concatenate([x[:, :1], x_], axis=1)
        x = x + self.decoder_pos_embed.astype(x.dtype)
        x = self.decoder_blocks(x, deterministic)
        x = self.decoder_norm(x)
        x = self.decoder_pred(x)
        return x[:, 1:]

    def loss(self, imgs, pred, mask):
        target = self.patchify(imgs).astype(jnp.float32)
        pred = pred.astype(jnp.float32)
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            # torch.var is unbiased by default (models_mae.py:207) —
            # ddof=1 for parity
            var = target.var(axis=-1, keepdims=True, ddof=1)
            target = (target - mean) / (var + 1e-6) ** 0.5
        per_patch = ((pred - target) ** 2).mean(axis=-1)
        loss = (per_patch * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        # per-image losses feed the 2D SPL hardness dict
        # (OCTCube/engine_pretrain.py:96-168)
        per_image = (per_patch * mask).sum(axis=1) / jnp.maximum(
            mask.sum(axis=1), 1.0)
        return loss, per_image

    def __call__(self, imgs, mask_ratio: float = 0.75,
                 deterministic: bool = True):
        latent, mask, ids_restore = self.encode(imgs, mask_ratio, deterministic)
        pred = self.decode(latent, ids_restore, deterministic)
        loss, per_image = self.loss(imgs, pred, mask)
        return loss, per_image, pred, mask


def mae_vit_base_patch16(**kw) -> MaskedAutoencoderViT2D:
    return MaskedAutoencoderViT2D(patch_size=16, embed_dim=768, depth=12,
                                  num_heads=12, decoder_embed_dim=512,
                                  decoder_depth=8, decoder_num_heads=16, **kw)


def mae_vit_large_patch16(**kw) -> MaskedAutoencoderViT2D:
    return MaskedAutoencoderViT2D(patch_size=16, embed_dim=1024, depth=24,
                                  num_heads=16, decoder_embed_dim=512,
                                  decoder_depth=8, decoder_num_heads=16, **kw)


flash_attn_mae_vit_large_patch16 = mae_vit_large_patch16
