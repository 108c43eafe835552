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
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]

    mask = jnp.ones((batch, length), dtype=jnp.float32)
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return MaskingResult(ids_keep=ids_keep, ids_restore=ids_restore, mask=mask)


def gather_tokens(x: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Gather tokens [B, L, D] by per-sample indices [B, K] -> [B, K, D]."""
    return jnp.take_along_axis(x, ids[..., None], axis=1)
