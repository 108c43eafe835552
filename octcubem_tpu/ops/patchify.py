"""Tube patchify / unpatchify as pure reshape+einsum ops (channel-last).

The reference uses nn.Conv3d with kernel == stride (OCTCube/util/
video_vit.py:72-75) which is exactly a block-reshape followed by a matmul.
On TPU the einsum form maps straight onto the MXU with no im2col and lets
XLA fuse the surrounding adds; it is also bit-exact w.r.t. the conv.

Layout: volumes are [B, T, H, W, C] (channel-last, TPU-native).  The
PyTorch importer permutes Conv3d weights [D, C, t, p, p] -> [t, p, p, C, D].
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify_3d(x: jnp.ndarray, t_patch: int, patch: int) -> jnp.ndarray:
    """[B, T, H, W, C] -> [B, t*h*w, t_patch*patch*patch*C] pixel patches.

    Flattened patch layout matches reference patchify
    (models_mae_joint_res_flash_attn.py:289-314): token order (t, h, w),
    within-patch order (u, p, q, c).
    """
    b, t, h, w, c = x.shape
    assert t % t_patch == 0 and h % patch == 0 and w % patch == 0
    tt, hh, ww = t // t_patch, h // patch, w // patch
    x = x.reshape(b, tt, t_patch, hh, patch, ww, patch, c)
    # n t u h p w q c -> n t h w u p q c
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, tt * hh * ww, t_patch * patch * patch * c)


def unpatchify_3d(
    x: jnp.ndarray, t_patch: int, patch: int, grid: tuple[int, int, int], channels: int
) -> jnp.ndarray:
    """[B, t*h*w, t_patch*p*p*C] -> [B, T, H, W, C]. Inverse of patchify_3d."""
    b = x.shape[0]
    tt, hh, ww = grid
    x = x.reshape(b, tt, hh, ww, t_patch, patch, patch, channels)
    # n t h w u p q c -> n t u h p w q c
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, tt * t_patch, hh * patch, ww * patch, channels)


def tube_embed(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None,
               t_patch: int, patch: int) -> jnp.ndarray:
    """Conv3d(kernel=stride) patch embedding as einsum.

    x:      [B, T, H, W, C]
    kernel: [t_patch, patch, patch, C, D]
    returns [B, t, h*w, D]  (the reference PatchEmbed output layout
    [N, T', H'W', C'], video_vit.py:77-86)
    """
    b, t, h, w, c = x.shape
    tt, hh, ww = t // t_patch, h // patch, w // patch
    x = x.reshape(b, tt, t_patch, hh, patch, ww, patch, c)
    out = jnp.einsum(
        "btuhpwqc,upqcd->bthwd", x, kernel.astype(x.dtype),
        preferred_element_type=x.dtype,
    )
    out = out.reshape(b, tt, hh * ww, kernel.shape[-1])
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def tube_embed_tokens(patches: jnp.ndarray, kernel: jnp.ndarray,
                      bias: jnp.ndarray | None) -> jnp.ndarray:
    """Embed already-patchified token rows: [B, K, t_patch*p*p*C] ->
    [B, K, D].

    The companion of patchify_3d for visible-token-only embedding (MAE
    encode): patchify_3d's within-patch order (u, p, q, c) matches
    kernel.reshape(-1, D) of the [t_patch, p, p, C, D] layout, so this
    is bit-identical to gathering tube_embed's output rows.  Keep this
    next to tube_embed — the two encode the same layout contract."""
    d = kernel.shape[-1]
    out = patches @ kernel.reshape(-1, d).astype(patches.dtype)
    if bias is not None:
        out = out + bias.astype(patches.dtype)
    return out
