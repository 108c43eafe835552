"""Sine-cosine positional embeddings and grid interpolation.

Parity targets: OCTCube/util/pos_embed.py:16-63 (sincos generation),
:71-105 (spatial bicubic interpolation on checkpoint load) and :109-140
(temporal linear-or-crop interpolation).  Generation is done in numpy at
module-construction time (static), interpolation via resize-as-matmul ops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .resize import resize_grid_bicubic, resize_seq_linear


def sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[M] positions -> [M, embed_dim] sincos embedding."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float32) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float32), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_2d(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """[grid*grid(+1), embed_dim] 2D sincos embedding (h-emb then w-emb halves)."""
    assert embed_dim % 2 == 0
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    # meshgrid with w varying fastest, matching the reference's
    # np.meshgrid(grid_w, grid_h) convention
    ww, hh = np.meshgrid(grid_w, grid_h)
    emb_h = sincos_1d(embed_dim // 2, hh)
    emb_w = sincos_1d(embed_dim // 2, ww)
    emb = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros([1, embed_dim], dtype=np.float32), emb], axis=0)
    return emb


def interpolate_spatial_pos_embed(
    pos: jnp.ndarray, old_grid: tuple[int, int], new_grid: tuple[int, int],
    num_extra_tokens: int = 0,
) -> jnp.ndarray:
    """Bicubic-resize a flattened [1, extra + H*W, D] spatial pos embed.

    Extra (cls) tokens pass through unchanged.
    """
    if old_grid == new_grid:
        return pos
    extra = pos[:, :num_extra_tokens]
    grid = pos[:, num_extra_tokens:].reshape(pos.shape[0], *old_grid, pos.shape[-1])
    grid = resize_grid_bicubic(grid, new_grid)
    grid = grid.reshape(pos.shape[0], new_grid[0] * new_grid[1], pos.shape[-1])
    return jnp.concatenate([extra, grid], axis=1)


def interpolate_temporal_pos_embed(
    pos: jnp.ndarray, new_len: int, smaller_interpolate_type: str = "interp"
) -> jnp.ndarray:
    """[1, T, D] -> [1, T', D]; linear interp, or middle-crop when shrinking
    and smaller_interpolate_type == 'crop'."""
    t = pos.shape[-2]
    if t == new_len:
        return pos
    if t > new_len and smaller_interpolate_type == "crop":
        start = (t - new_len) // 2
        return pos[:, start : start + new_len]
    return resize_seq_linear(pos, new_len)


def build_sep_pos_embed(
    pos_spatial: jnp.ndarray,   # [1, Hs*Ws, D] (stored at its own grid)
    pos_temporal: jnp.ndarray,  # [1, T, D]
    stored_grid: tuple[int, int],
    target_grid: tuple[int, int],
    t_grid: int,
    pos_class: jnp.ndarray | None = None,  # [1, 1, D]
    use_temporal: bool = True,
) -> jnp.ndarray:
    """Combine separable spatial+temporal pos embeds into a [1, (1+)T*L, D]
    token-aligned embedding, bicubic-pooling the spatial grid if the stored
    grid differs from the target (reference joint-res MAE pools its 512-grid
    embedding down for 256 inputs, models_mae_joint_res_flash_attn.py:415-448).

    use_temporal=False reproduces the reference's T==1 path (2D inputs): only
    the spatial embedding, no temporal term.
    """
    d = pos_spatial.shape[-1]
    spat = interpolate_spatial_pos_embed(pos_spatial, stored_grid, target_grid)
    l = target_grid[0] * target_grid[1]
    if use_temporal:
        pos = jnp.tile(spat, (1, t_grid, 1)) + jnp.repeat(pos_temporal, l, axis=1)
    else:
        pos = spat
    if pos_class is not None:
        pos = jnp.concatenate([pos_class, pos], axis=1)
    return pos.reshape(1, -1, d)
