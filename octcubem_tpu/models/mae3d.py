"""Joint-resolution 3D masked autoencoder — the OCTCube pretrainer.

Parity target: Pre-training/models_mae_joint_res_flash_attn.py (843 LoC).
Key behaviours reproduced:
- dual patch embeds: low-res (256²) 3D tube embed + high-res (512²) embed;
  input resolution dispatched on static H (ref :377-384).
- separable learned pos embeds stored at the HIGH-res spatial grid and
  bicubically pooled down for low-res inputs each forward (ref :415-448,
  :532-557) — here via the exact resize-as-matmul op.
- 2D co-training inputs arrive as T=3 replicated frames (one temporal tube,
  T'=1); those get no temporal pos-embed term (ref temp_pos_emb_type='none',
  :402-404) and the loss patchifies directly without frame subsampling
  (ref :627-628).
- random tube masking with optional blank-region pre-mask; static-shape
  formulation (see ops/masking.py).
- decoder infers actual_t_dim from ids_restore length so 3D and 2D inputs
  share one decoder (ref :499-606).
- loss: per-patch MSE on masked tokens over pred_t_dim-subsampled frames,
  optional norm_pix, plus per-frame losses for SPL (ref :613-667).
- flash-attn final-feature semantics (no last residual add) for both
  encoder and decoder stacks -> parity='flash'.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.layers import TransformerStack, LN_EPS
from ..nn.patch_embed import PatchEmbed3D
from ..ops.masking import random_masking, gather_tokens
from ..ops.patchify import patchify_3d, tube_embed_tokens
from ..ops.resize import resize_grid_bicubic


class MaskedAutoencoderViT3D(nn.Module):
    input_size: int = 256
    high_res_input_size: int = 512
    patch_size: int = 16
    in_chans: int = 1
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    num_frames: int = 60
    t_patch_size: int = 3
    pred_t_dim: int = 60
    sep_pos_embed: bool = True
    cls_embed: bool = True
    norm_pix_loss: bool = False
    drop_path_rate: float = 0.0
    parity: str = "flash"
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    remat_norm: bool = False

    @property
    def t_pred_patch_size(self) -> int:
        return self.t_patch_size * self.pred_t_dim // self.num_frames

    @property
    def grid(self) -> int:
        return self.input_size // self.patch_size

    @property
    def high_res_grid(self) -> int:
        return self.high_res_input_size // self.patch_size

    @property
    def t_grid(self) -> int:
        return self.num_frames // self.t_patch_size

    def setup(self):
        d, dd = self.embed_dim, self.decoder_embed_dim
        self.patch_embed = PatchEmbed3D(
            self.input_size, self.patch_size, self.in_chans, d,
            self.num_frames, self.t_patch_size, dtype=self.dtype)
        self.high_res_patch_embed = PatchEmbed3D(
            self.high_res_input_size, self.patch_size, self.in_chans, d,
            self.num_frames, self.t_patch_size, dtype=self.dtype)

        hr_l = self.high_res_grid ** 2
        if self.cls_embed:
            self.cls_token = self.param(
                "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, d))
            self.decoder_cls_token = self.param(
                "decoder_cls_token", nn.initializers.truncated_normal(0.02),
                (1, 1, dd))
        assert self.sep_pos_embed, "joint-res MAE requires sep_pos_embed"
        self.pos_embed_spatial = self.param(
            "pos_embed_spatial", nn.initializers.truncated_normal(0.02),
            (1, hr_l, d))
        self.pos_embed_temporal = self.param(
            "pos_embed_temporal", nn.initializers.truncated_normal(0.02),
            (1, self.t_grid, d))
        self.decoder_pos_embed_spatial = self.param(
            "decoder_pos_embed_spatial", nn.initializers.truncated_normal(0.02),
            (1, hr_l, dd))
        self.decoder_pos_embed_temporal = self.param(
            "decoder_pos_embed_temporal", nn.initializers.truncated_normal(0.02),
            (1, self.t_grid, dd))
        if self.cls_embed:
            self.pos_embed_class = self.param(
                "pos_embed_class", nn.initializers.truncated_normal(0.02),
                (1, 1, d))
            self.decoder_pos_embed_class = self.param(
                "decoder_pos_embed_class", nn.initializers.truncated_normal(0.02),
                (1, 1, dd))

        self.blocks = TransformerStack(
            self.depth, d, self.num_heads, self.mlp_ratio, self.qkv_bias,
            self.drop_path_rate, dtype=self.dtype, attn_impl=self.attn_impl,
            parity=self.parity, remat=self.remat,
            remat_norm=self.remat_norm)
        self.norm = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32)
        self.decoder_embed = nn.Dense(dd, dtype=self.dtype)
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, dd))
        self.decoder_blocks = TransformerStack(
            self.decoder_depth, dd, self.decoder_num_heads, self.mlp_ratio,
            self.qkv_bias, self.drop_path_rate, dtype=self.dtype,
            attn_impl=self.attn_impl, parity=self.parity, remat=self.remat,
            remat_norm=self.remat_norm)
        self.decoder_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32)
        self.decoder_pred = nn.Dense(
            self.t_pred_patch_size * self.patch_size ** 2 * self.in_chans,
            dtype=self.dtype)

    # -------------------------------------------------------------- helpers

    def _is_high_res(self, x) -> bool:
        return x.shape[2] == self.high_res_input_size

    def _spatial_pos(self, pos_hr, high_res: bool, d: int):
        """Pool the high-res spatial embedding down for low-res inputs
        (ref :415-427)."""
        g_hr = self.high_res_grid
        if high_res:
            return pos_hr, g_hr
        grid = pos_hr.reshape(1, g_hr, g_hr, d)
        pooled = resize_grid_bicubic(grid, (self.grid, self.grid))
        return pooled.reshape(1, self.grid * self.grid, d), self.grid

    # ------------------------------------------------------------- encoder

    def encode(self, x, mask_ratio: float, pre_mask=None,
               deterministic: bool = True):
        """x: [B, T, H, W, C].  Returns (latent, mask, ids_restore)."""
        high_res = self._is_high_res(x)
        # touch both embeds so init materializes both param sets regardless
        # of which resolution the init example has
        _ = (self.patch_embed.kernel, self.high_res_patch_embed.kernel)
        pe = self.high_res_patch_embed if high_res else self.patch_embed
        # same input contract PatchEmbed3D.__call__ asserts (square
        # spatial dims at the embed's resolution, tube-divisible T)
        assert x.shape[2] == x.shape[3] == pe.img_size, (
            f"input {x.shape[2]}x{x.shape[3]} != model {pe.img_size}")
        assert x.shape[1] % self.t_patch_size == 0, x.shape
        b = x.shape[0]
        t = x.shape[1] // self.t_patch_size
        g_in = x.shape[2] // self.patch_size
        l = g_in * g_in
        d = self.embed_dim

        # VISIBLE-TOKEN-ONLY embedding: tube-patchify (data movement
        # only), gather the kept rows, then run the embed matmul on just
        # those (tube_embed_tokens).  Bit-identical to the reference's
        # embed-all-then-discard (models_mae_joint_res_flash_attn.py:
        # 377-407 — the patch embed is per-token linear, so gather and
        # matmul commute), but skips ~mask_ratio of the embed FLOPs and
        # the corresponding dW backward.
        rng = self.make_rng("masking") if mask_ratio > 0 else None
        patches = patchify_3d(x.astype(self.dtype), self.t_patch_size,
                              self.patch_size)
        mk = random_masking(rng, b, t * l, mask_ratio, pre_mask=pre_mask)
        vis = gather_tokens(patches, mk.ids_keep)
        x = tube_embed_tokens(vis, pe.kernel, pe.bias)

        pos_spat, g = self._spatial_pos(self.pos_embed_spatial, high_res, d)
        if t == 1:
            pos = pos_spat  # 2D input: no temporal term (ref :437-440)
        else:
            pos = (jnp.tile(pos_spat, (1, t, 1))
                   + jnp.repeat(self.pos_embed_temporal, g * g, axis=1))
        pos = jnp.broadcast_to(pos, (b, t * l, d))
        pos = gather_tokens(pos, mk.ids_keep)

        if self.cls_embed:
            cls = jnp.broadcast_to(self.cls_token, (b, 1, d)).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)
            pos = jnp.concatenate(
                [jnp.broadcast_to(self.pos_embed_class, (b, 1, d)), pos], axis=1)
        x = x + pos.astype(x.dtype)

        x = self.blocks(x, deterministic)
        x = self.norm(x)
        if self.cls_embed:
            x = x[:, 1:]
        return x, mk.mask, mk.ids_restore

    # ------------------------------------------------------------- decoder

    def decode(self, x, ids_restore, high_res: bool = False,
               deterministic: bool = True):
        b = x.shape[0]
        g = self.high_res_grid if high_res else self.grid
        l = g * g
        actual_t = ids_restore.shape[-1] // l

        x = self.decoder_embed(x)
        c = x.shape[-1]
        n_mask = actual_t * l - x.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token, (b, n_mask, c)).astype(x.dtype)
        x = jnp.concatenate([x, mask_tokens], axis=1)
        x = gather_tokens(x, ids_restore)  # unshuffle

        pos_spat, _ = self._spatial_pos(
            self.decoder_pos_embed_spatial, high_res, c)
        if actual_t == 1:
            pos = pos_spat
        else:
            pos = (jnp.tile(pos_spat, (1, self.t_grid, 1))
                   + jnp.repeat(self.decoder_pos_embed_temporal, l, axis=1))
        if self.cls_embed:
            cls = jnp.broadcast_to(self.decoder_cls_token, (b, 1, c)).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)
            pos = jnp.concatenate([self.decoder_pos_embed_class, pos], axis=1)
        x = x + pos.astype(x.dtype)

        x = self.decoder_blocks(x, deterministic)
        x = self.decoder_norm(x)
        x = self.decoder_pred(x)
        if self.cls_embed:
            x = x[:, 1:]
        return x

    # --------------------------------------------------------------- loss

    def loss(self, imgs, pred, mask):
        """imgs: [B, T, H, W, C]; pred: [B, t*h*w, u*p*p*C]; mask: [B, L].

        Returns (loss, frame_losses[B, t]) — per-temporal-patch losses feed
        the SPL hardness dict (ref :649-667).
        """
        t = imgs.shape[1]
        u = self.t_pred_patch_size
        if t == self.t_patch_size:
            target = patchify_3d(imgs, u, self.patch_size)
        else:
            idx = np.linspace(0, t - 1, self.pred_t_dim).astype(np.int64)
            target = patchify_3d(imgs[:, idx], u, self.patch_size)
        target = target.astype(jnp.float32)
        pred = pred.astype(jnp.float32)
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            # torch.var defaults to the UNBIASED (n-1) estimator
            # (ref :644-646); jnp.var defaults to biased — ddof=1 for parity
            var = target.var(axis=-1, keepdims=True, ddof=1)
            target = (target - mean) / (var + 1e-6) ** 0.5
        per_patch = ((pred - target) ** 2).mean(axis=-1)  # [B, L]
        mask = mask.reshape(per_patch.shape)

        b = per_patch.shape[0]
        h = imgs.shape[2] // self.patch_size
        w = imgs.shape[3] // self.patch_size
        t_tokens = per_patch.shape[1] // (h * w)
        pl = per_patch.reshape(b, t_tokens, -1)
        ml = mask.reshape(b, t_tokens, -1)
        frame_losses = (pl * ml).sum(axis=-1) / (ml.sum(axis=-1) + 1e-6)

        # guard: mask_ratio=0 (pure-reconstruction eval) has no masked
        # tokens; report 0 instead of 0/0
        loss = (per_patch * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return loss, frame_losses

    # ------------------------------------------------------------- forward

    def __call__(self, imgs, mask_ratio: float = 0.75, pre_mask=None,
                 deterministic: bool = True):
        """Full MAE step. Returns (loss, frame_losses, pred, mask)."""
        high_res = self._is_high_res(imgs)
        latent, mask, ids_restore = self.encode(
            imgs, mask_ratio, pre_mask, deterministic)
        pred = self.decode(latent, ids_restore, high_res, deterministic)
        loss, frame_losses = self.loss(imgs, pred, mask)
        return loss, frame_losses, pred, mask

    def forward_patch_embed(self, imgs):
        """Patch-embed only — feeds the blank-region mask computation
        (ref :777-790)."""
        pe = self.high_res_patch_embed if self._is_high_res(imgs) else self.patch_embed
        x = pe(imgs)
        b, t, l, d = x.shape
        return x.reshape(b, t * l, d)


# ---- constructor registry ----

def mae_vit_base_patch16(**kw) -> MaskedAutoencoderViT3D:
    kw.setdefault("num_heads", 12)
    return MaskedAutoencoderViT3D(patch_size=16, embed_dim=768, depth=12,
                                  **kw)


def mae_vit_large_patch16(**kw) -> MaskedAutoencoderViT3D:
    # num_heads (encoder) is overridable like decoder_num_heads: head
    # re-partitioning keeps the param tree identical (Wqkv is [D, 3D]
    # regardless of the head slicing)
    kw.setdefault("num_heads", 16)
    return MaskedAutoencoderViT3D(patch_size=16, embed_dim=1024, depth=24,
                                  **kw)


flash_attn_mae_vit_large_patch16 = mae_vit_large_patch16


def mae_vit_huge_patch14(**kw) -> MaskedAutoencoderViT3D:
    kw.setdefault("num_heads", 16)
    return MaskedAutoencoderViT3D(patch_size=14, embed_dim=1280, depth=32,
                                  **kw)
