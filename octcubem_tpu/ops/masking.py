"""Random tube masking for MAE pretraining — static shapes under jit.

Parity target: models_mae_joint_res_flash_attn.py:336-372 (argsort of
uniform noise; first ``len_keep`` kept) plus the blank-region ``pre_mask``
path.  The reference derives a data-dependent ``len_keep`` from the
pre-mask (a dynamic shape, incompatible with XLA); here the pre-mask is
folded into the sort key instead: pre-masked tokens get +1 added to their
noise so they always sort last and are therefore always masked, while
``len_keep`` stays the static ``int(L * (1 - mask_ratio))``.  Upstream,
``fill_patch_mask_to_ratio`` already tops the blank-mask up to the target
ratio, so the kept-count matches the reference to within one token.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MaskingResult(NamedTuple):
    ids_keep: jnp.ndarray     # [B, len_keep] indices of visible tokens
    ids_restore: jnp.ndarray  # [B, L] inverse shuffle permutation
    mask: jnp.ndarray         # [B, L] float, 0 = keep, 1 = masked


def random_masking(
    rng: jax.Array | None,
    batch: int,
    length: int,
    mask_ratio: float,
    pre_mask: jnp.ndarray | None = None,
) -> MaskingResult:
    """Per-sample random masking by argsort of uniform noise.

    mask_ratio == 0 degenerates to the identity permutation (reference
    behaviour for the eval path, models_mae_joint_res_flash_attn.py:350-352).
    """
    len_keep = int(length * (1 - mask_ratio))
    if mask_ratio > 0:
        assert rng is not None
        noise = jax.random.uniform(rng, (batch, length))
    else:
        noise = jnp.broadcast_to(
            jnp.arange(length, dtype=jnp.float32)[None, :], (batch, length)
        )
    if pre_mask is not None:
        # force-mask blank tokens: they sort after every un-premasked token
        noise = noise + (pre_mask > 0).astype(noise.dtype)

    ids_shuffle = jnp.argsort(noise, axis=1)
    # inverse permutation via scatter instead of a second argsort: TPU
    # sorts are VPU-bound bitonic networks (O(L log^2 L)); the scatter is
    # one pass.  Identical result: ids_restore[ids_shuffle[i]] = i.
    ids_restore = jnp.zeros_like(ids_shuffle).at[
        jnp.arange(batch)[:, None], ids_shuffle
    ].set(jnp.broadcast_to(jnp.arange(length)[None, :], (batch, length)))
    ids_keep = ids_shuffle[:, :len_keep]

    mask = jnp.ones((batch, length), dtype=jnp.float32)
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return MaskingResult(ids_keep=ids_keep, ids_restore=ids_restore, mask=mask)


def gather_tokens(x: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Gather tokens [B, L, D] by per-sample indices [B, K] -> [B, K, D]."""
    return jnp.take_along_axis(x, ids[..., None], axis=1)


# Autodiff of take_along_axis produces a SCATTER-ADD on the backward.
# The MAE gathers are permutations (or subsets of one), so their exact
# VJPs can be expressed as gathers.  MEASURED on v5e (NOTES_ROUND2.md):
# XLA already lowers these permutation scatters efficiently, and the
# custom VJPs' extra argsort/concat made the full step ~2ms SLOWER, so
# the models keep plain take_along_axis; these utilities remain for
# backends where scatter is the bottleneck:
#   unshuffle (full permutation p):      d/dx = gather by p^-1
#   keep-gather (first K of a shuffle):  d/dx = pad grads with the masked
#     zeros, then unshuffle — scatter(g at ids_keep) == take(concat(g, 0),
#     ids_restore) because ids_restore[pos] indexes the shuffle rank.

@jax.custom_vjp
def permute_tokens(x: jnp.ndarray, ids: jnp.ndarray,
                   ids_inv: jnp.ndarray) -> jnp.ndarray:
    """[B, L, D] reordered by the permutation ids [B, L]; ids_inv is its
    inverse (used only for the scatter-free backward)."""
    return jnp.take_along_axis(x, ids[..., None], axis=1)


def _permute_fwd(x, ids, ids_inv):
    return permute_tokens(x, ids, ids_inv), (ids_inv,)


def _permute_bwd(res, g):
    (ids_inv,) = res
    return jnp.take_along_axis(g, ids_inv[..., None], axis=1), None, None


permute_tokens.defvjp(_permute_fwd, _permute_bwd)


@jax.custom_vjp
def gather_keep_tokens(x: jnp.ndarray, ids_keep: jnp.ndarray,
                       ids_restore: jnp.ndarray) -> jnp.ndarray:
    """[B, L, D] -> [B, K, D], the visible-token gather; ids_restore is
    the full inverse shuffle (for the scatter-free backward)."""
    return jnp.take_along_axis(x, ids_keep[..., None], axis=1)


def _gather_keep_fwd(x, ids_keep, ids_restore):
    out = gather_keep_tokens(x, ids_keep, ids_restore)
    return out, (ids_restore, x.shape[1])


def _gather_keep_bwd(res, g):
    ids_restore, length = res
    b, k, d = g.shape
    pad = jnp.zeros((b, length - k, d), g.dtype)
    full = jnp.concatenate([g, pad], axis=1)
    dx = jnp.take_along_axis(full, ids_restore[..., None], axis=1)
    return dx, None, None


gather_keep_tokens.defvjp(_gather_keep_fwd, _gather_keep_bwd)
