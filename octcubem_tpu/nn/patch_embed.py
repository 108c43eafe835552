"""Patch embedding modules (einsum tube patchify, channel-last).

Exact equivalents of the reference Conv3d/Conv2d patch embeds
(OCTCube/util/video_vit.py:29-86): kernel == stride convs are
block-reshape + matmul, which is what we emit directly.

Params are declared in setup() (not lazily in __call__) so that models with
resolution-dispatched dual embeds (the joint-res MAE) materialize both
kernels at init regardless of which branch the init example exercises.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops.patchify import tube_embed


class PatchEmbed3D(nn.Module):
    """[B, T, H, W, C] -> [B, t, h*w, D] tube patch embedding.

    Param 'kernel' is stored [t_patch, p, p, C, D]; importer permutes the
    reference Conv3d weight [D, C, t, p, p].
    """

    img_size: int
    patch_size: int
    in_chans: int
    embed_dim: int
    frames: int
    t_patch_size: int
    dtype: jnp.dtype = jnp.float32

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def t_grid_size(self) -> int:
        return self.frames // self.t_patch_size

    @property
    def input_size(self) -> tuple[int, int, int]:
        return (self.t_grid_size, self.grid_size, self.grid_size)

    @property
    def num_patches(self) -> int:
        return self.t_grid_size * self.grid_size * self.grid_size

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.xavier_uniform(in_axis=(0, 1, 2, 3), out_axis=4),
            (self.t_patch_size, self.patch_size, self.patch_size,
             self.in_chans, self.embed_dim),
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))

    def __call__(self, x):
        assert x.shape[2] == self.img_size and x.shape[3] == self.img_size, (
            f"input {x.shape[2]}x{x.shape[3]} != model {self.img_size}"
        )
        return tube_embed(x.astype(self.dtype), self.kernel, self.bias,
                          self.t_patch_size, self.patch_size)


class PatchEmbed2D(nn.Module):
    """[B, H, W, C] -> [B, h*w, D] patch embedding (Conv2d equivalent)."""

    img_size: int
    patch_size: int
    in_chans: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    def setup(self):
        p = self.patch_size
        self.kernel = self.param(
            "kernel",
            nn.initializers.xavier_uniform(in_axis=(0, 1, 2), out_axis=3),
            (p, p, self.in_chans, self.embed_dim),
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))

    def __call__(self, x):
        b, h, w, c = x.shape
        p = self.patch_size
        hh, ww = h // p, w // p
        x = x.reshape(b, hh, p, ww, p, c).astype(self.dtype)
        out = jnp.einsum("bhpwqc,pqcd->bhwd", x, self.kernel.astype(x.dtype))
        return out.reshape(b, hh * ww, self.embed_dim) + self.bias.astype(x.dtype)
