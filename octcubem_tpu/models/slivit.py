"""SLIViT baseline: ConvNeXt-tiny slice feature extractor + compact ViT
over per-slice feature maps.

Parity targets:
- OCTCube/model_slivit_baseline.py:18-92: slices stacked into one tall
  image -> HF ConvNeXt-tiny trunk (final LayerNorm dropped) -> features
  reshaped to [B, N, 768*64] tokens -> vit-pytorch ViT (dim 256, depth 5,
  heads 20, dim_head 64, mlp 512) with integer-arange positional
  embedding and cls pooling.
- OCTCube/models_slivit_head.py: the same ViT head standalone, for
  bolting onto OCTCube/RETFound backbones
  (models_vit_st_flash_attn_slivit.py).

ConvNeXt-tiny is implemented natively in flax (channel-last, depthwise
7x7 + pointwise MLP + layer scale), matching facebook/convnext-tiny-224.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return inp + x * gamma.astype(x.dtype)


class ConvNeXtTiny(nn.Module):
    """Feature trunk: [B, H, W, 3] -> [B, H/32, W/32, 768] (no final LN,
    matching the reference's dropped-LayerNorm trunk)."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dims[0], (4, 4), strides=4, dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="stem_norm")(x)
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 name=f"downsample_norm_{stage}")(x)
                x = nn.Conv(dim, (2, 2), strides=2, dtype=self.dtype,
                            name=f"downsample_conv_{stage}")(x)
            for blk in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype,
                                  name=f"stage{stage}_block{blk}")(x)
        return x


class SLIViTHead(nn.Module):
    """vit-pytorch-style compact ViT over N feature-'patch' tokens.

    tokens: [B, N, patch_dim] -> logits [B, num_classes].
    Positional embedding defaults to the reference's integer arange
    (token i gets the constant vector i), rnd_pos_emb=True for learned.
    """

    num_patches: int
    patch_dim: int
    num_classes: int = 1
    dim: int = 256
    depth: int = 5
    heads: int = 20
    dim_head: int = 64
    mlp_dim: int = 512
    rnd_pos_emb: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        b, n, _ = tokens.shape
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm1")(
            tokens.astype(jnp.float32))
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(
            x.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm2")(x)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim)), x], axis=1)
        if self.rnd_pos_emb:
            pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                             (1, self.num_patches + 1, self.dim))
        else:
            pos = jnp.broadcast_to(
                jnp.arange(self.num_patches + 1, dtype=jnp.float32)[None, :, None],
                (1, self.num_patches + 1, self.dim))
        x = x + pos.astype(x.dtype)

        inner = self.heads * self.dim_head
        for i in range(self.depth):
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name=f"blocks_{i}_attn_norm")(x)
            qkv = nn.Dense(3 * inner, use_bias=False, dtype=self.dtype,
                           name=f"blocks_{i}_to_qkv")(h.astype(self.dtype))
            qkv = qkv.reshape(b, -1, 3, self.heads, self.dim_head)
            q, k, v = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s * self.dim_head ** -0.5, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, -1, inner)
            x = x + nn.Dense(self.dim, dtype=self.dtype,
                             name=f"blocks_{i}_to_out")(ctx)
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name=f"blocks_{i}_mlp_norm")(x)
            h = nn.Dense(self.mlp_dim, dtype=self.dtype,
                         name=f"blocks_{i}_mlp_fc1")(h.astype(self.dtype))
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim, dtype=self.dtype,
                         name=f"blocks_{i}_mlp_fc2")(h)
            x = x + h
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_norm")(x)
        x = x[:, 0]
        return nn.Dense(self.num_classes, dtype=self.dtype, name="mlp_head")(x)


class ViTSTWithSLIViTHead(nn.Module):
    """OCTCube (ViT-ST) backbone + SLIViT head.

    Parity target: OCTCube/models_vit_st_flash_attn_slivit.py:85-260 —
    the backbone's final tokens (un-normed last-MLP-branch under flash
    semantics, cls dropped) are regrouped per temporal slab
    [B, T', C, L] -> [B, T', C*L] and fed to the SLIViT compact ViT.
    (The RETFound variant, models_vit_3dhead_flash_attn_slivit.py, is
    defective dead code in the reference: `slivit_depth_num` is an
    undefined name in its __init__ (NameError on construction, :44), the
    SLIViT_head is never invoked in forward_features (:49-68), and no
    main imports the module — not rebuilt, per the SURVEY dead-code
    rule.)
    """

    num_classes: int = 1
    trunk_kwargs: dict = None
    slivit_depth: int = 5
    dtype: Any = jnp.float32

    @property
    def patch_size(self) -> int:
        return (self.trunk_kwargs or {}).get("patch_size", 16)

    def setup(self):
        from .vit_st import VisionTransformerST

        kw = dict(self.trunk_kwargs or {})
        kw.setdefault("cls_embed", True)
        kw.setdefault("global_pool", True)
        self.trunk = VisionTransformerST(num_classes=1, dtype=self.dtype, **kw)
        t_grid = self.trunk.num_frames // self.trunk.t_patch_size
        l = (self.trunk.img_size // self.trunk.patch_size) ** 2
        self.head = SLIViTHead(
            num_patches=t_grid, patch_dim=self.trunk.embed_dim * l,
            num_classes=self.num_classes, depth=self.slivit_depth,
            dtype=self.dtype)

    def __call__(self, x, deterministic: bool = True):
        tokens = self.trunk(x, deterministic=deterministic,
                            return_hidden=True)[-1]
        if self.trunk.cls_embed:
            tokens = tokens[:, 1:]
        b, tl, d = tokens.shape
        t_grid = self.trunk.num_frames // self.trunk.t_patch_size
        l = tl // t_grid
        tok = tokens.reshape(b, t_grid, l, d).transpose(0, 1, 3, 2)
        tok = tok.reshape(b, t_grid, d * l)
        return self.head(tok, deterministic)


class SLIViT(nn.Module):
    """Full baseline: [B, N, H, W, C] slices -> logits.

    Slices are stacked into one tall image before the ConvNeXt trunk so
    receptive fields cross slice boundaries exactly like the reference's
    tall-image formulation (model_slivit_baseline.py:44-49).
    """

    num_patches: int = 20           # N slices
    num_classes: int = 1
    slice_size: int = 256
    vit_depth: int = 5              # --slivit_vit_depth_num (main_…diffmodal.py:101)
    convnext_depths: Sequence[int] = (3, 3, 9, 3)
    convnext_dims: Sequence[int] = (96, 192, 384, 768)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, h, w, c = x.shape
        assert n == self.num_patches
        if c == 1:
            x = jnp.repeat(x, 3, axis=-1)
        tall = x.reshape(b, n * h, w, 3)
        feat = ConvNeXtTiny(depths=self.convnext_depths,
                            dims=self.convnext_dims, dtype=self.dtype,
                            name="feature_extractor")(tall)
        fh, fw, fc = feat.shape[1:]
        per = fh // n
        # [B, n*per, fw, 768] -> tokens [B, n, 768 * per * fw]
        # (channel-first flatten order c, h, w like the reference Rearrange)
        tok = feat.reshape(b, n, per, fw, fc).transpose(0, 1, 4, 2, 3)
        tok = tok.reshape(b, n, fc * per * fw)
        return SLIViTHead(
            num_patches=self.num_patches, patch_dim=tok.shape[-1],
            num_classes=self.num_classes, depth=self.vit_depth,
            dtype=self.dtype, name="vit")(tok, deterministic)


# ---- constructor registry (reference models_*.__dict__[name] pattern) ----

def slivit_baseline(*, num_classes=1, num_frames=20, img_size=256,
                    slivit_depth=5, convnext_depths=(3, 3, 9, 3),
                    convnext_dims=(96, 192, 384, 768),
                    dtype=jnp.float32) -> SLIViT:
    """The standalone SLIViT baseline (model_slivit_baseline.py:18-92);
    num_frames = N slices sparsed from the volume (--slivit_slices)."""
    return SLIViT(num_patches=num_frames, num_classes=num_classes,
                  slice_size=img_size, vit_depth=slivit_depth,
                  convnext_depths=tuple(convnext_depths),
                  convnext_dims=tuple(convnext_dims), dtype=dtype)


def vit_large_patch16_slivit(*, num_classes=1, slivit_depth=5,
                             dtype=jnp.float32, **trunk_kw):
    """OCTCube ViT-L trunk + SLIViT head
    (models_vit_st_flash_attn_slivit.py vit_large_patch16 with
    slivit_depth_num, built at main_…diffmodal.py:1083-1094)."""
    trunk = dict(patch_size=16, embed_dim=1024, depth=24, num_heads=16)
    trunk.update(trunk_kw)
    return ViTSTWithSLIViTHead(num_classes=num_classes, trunk_kwargs=trunk,
                               slivit_depth=slivit_depth, dtype=dtype)


flash_attn_vit_large_patch16_slivit = vit_large_patch16_slivit
