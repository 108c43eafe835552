"""Blank-region pre-mask from patch embeddings — vectorized TPU redesign.

Parity target (behavioural): Pre-training/custom_util/misc.py get_mask /
process_and_adjust_mask / fill_patch_mask_to_ratio (:734-988): detect
large blank regions of each B-scan from the self-similarity of its patch
embeddings, convert to a patch-level mask, and top it up so every frame
masks the same number of patches (>= L/2).

The reference walks each frame with serpentine Python loops; here the
whole batch is computed with batched matmuls + sorts under jit:
1. per-frame patch cosine-similarity (MXU batched matmul);
2. per-patch mean similarity; top `p_emb_mask_ratio` fraction = blank
   candidates (blank regions are self-similar);
3. vectorized cleanup: clear the top/bottom `up_down_clear` patch rows
   (reference does the same to avoid masking image borders);
4. per-volume target count = max(max per-frame count, L/2), topped up per
   frame by the highest-similarity unmasked patches (replaces the
   reference's serpentine column fill — same count, same "most blank
   first" priority).

Returns a [B, T*L] float mask (1 = force-mask), the format the MAE's
random_masking pre_mask expects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("t_grid", "grid",
                                             "p_emb_mask_ratio",
                                             "up_down_clear"))
def compute_premask(patch_embed: jnp.ndarray, t_grid: int, grid: int,
                    p_emb_mask_ratio: float = 0.6,
                    up_down_clear: int = 3) -> jnp.ndarray:
    """patch_embed: [B, T*L, D] (from model.forward_patch_embed)."""
    b, tl, d = patch_embed.shape
    l = grid * grid
    assert tl == t_grid * l
    x = patch_embed.reshape(b, t_grid, l, d).astype(jnp.float32)
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
    sim = jnp.einsum("btld,btmd->btlm", x, x)          # [B, T, L, L]
    score = sim.mean(axis=-1)                           # [B, T, L]

    k = int(l * p_emb_mask_ratio)
    # candidates: top-k most self-similar patches per frame
    thresh = jnp.sort(score, axis=-1)[..., l - k][..., None]
    cand = (score >= thresh).astype(jnp.float32)        # [B, T, L]

    # clear top/bottom patch rows (image borders)
    row = jnp.arange(l) // grid
    border = (row < up_down_clear) | (row >= grid - up_down_clear)
    cand = jnp.where(border[None, None, :], 0.0, cand)

    # per-volume target count: max over frames, at least L/2
    counts = cand.sum(axis=-1)                          # [B, T]
    target = jnp.maximum(counts.max(axis=-1, keepdims=True), l // 2)  # [B,1]

    # top-up each frame to `target` using highest-score unmasked patches:
    # order all patches by (already-masked desc, score desc), mask first
    # `target` of them
    key = cand * 1e6 + score
    order = jnp.argsort(-key, axis=-1)                  # [B, T, L]
    rank = jnp.argsort(order, axis=-1)                  # rank of each patch
    mask = (rank < target[..., None]).astype(jnp.float32)
    return mask.reshape(b, t_grid * l)
