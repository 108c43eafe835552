"""Pallas flash attention (interpret mode on CPU) vs the naive reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octcubem_tpu.ops.attention import naive_attention
from octcubem_tpu.ops.flash_attention import flash_attention


def _rand_qkv(key, b, h, n, d, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (b, h, n, d), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.mark.parametrize("n", [128, 256, 513])
def test_forward_matches_naive(n):
    q, k, v = _rand_qkv(jax.random.key(0), 1, 2, n, 64)
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    ref = naive_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_grad_matches_naive():
    q, k, v = _rand_qkv(jax.random.key(1), 1, 1, 192, 64)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, block_q=128, block_k=128) ** 2).sum()

    def loss_naive(q, k, v):
        return (naive_attention(q, k, v) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_nomax_large_logits():
    """Fixed-shift softmax must stay exact for logit magnitudes far above
    typical (up to the clamp)."""
    q, k, v = _rand_qkv(jax.random.key(5), 1, 2, 256, 64)
    q = q * 6.0  # logits roughly in [-30, 30], below NOMAX_CLAMP
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    ref = naive_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
