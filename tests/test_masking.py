import numpy as np
import jax
import jax.numpy as jnp

from octcubem_tpu.ops.masking import random_masking, gather_tokens


def test_mask_count_and_restore():
    rng = jax.random.key(0)
    b, l = 4, 100
    mk = random_masking(rng, b, l, 0.75)
    assert mk.ids_keep.shape == (b, 25)
    mask = np.asarray(mk.mask)
    assert (mask.sum(axis=1) == 75).all()
    # kept positions must be unmasked
    keep = np.asarray(mk.ids_keep)
    for i in range(b):
        assert (mask[i, keep[i]] == 0).all()


def test_mask_ratio_zero_identity():
    mk = random_masking(None, 2, 10, 0.0)
    np.testing.assert_array_equal(np.asarray(mk.ids_keep),
                                  np.tile(np.arange(10), (2, 1)))
    assert np.asarray(mk.mask).sum() == 0


def test_pre_mask_forces_masking():
    rng = jax.random.key(1)
    b, l = 2, 64
    pre = np.zeros((b, l), dtype=np.float32)
    pre[:, :10] = 1.0  # first 10 tokens blank -> must be masked
    mk = random_masking(rng, b, l, 0.5, pre_mask=jnp.asarray(pre))
    mask = np.asarray(mk.mask)
    assert (mask[:, :10] == 1).all()
    assert (mask.sum(axis=1) == 32).all()


def test_gather_restore_inverse():
    rng = jax.random.key(2)
    b, l, d = 2, 50, 8
    x = jax.random.normal(jax.random.key(3), (b, l, d))
    mk = random_masking(rng, b, l, 0.6)
    kept = gather_tokens(x, mk.ids_keep)
    # scatter kept tokens back through ids_restore: positions where mask==0
    # must recover the original tokens
    full = jnp.concatenate(
        [kept, jnp.zeros((b, l - kept.shape[1], d))], axis=1)
    restored = gather_tokens(full, mk.ids_restore)
    keep_pos = np.asarray(mk.mask) == 0
    np.testing.assert_allclose(
        np.asarray(restored)[keep_pos], np.asarray(x)[keep_pos], atol=1e-6)
