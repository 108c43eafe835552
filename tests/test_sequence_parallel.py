"""Rectangular flash attention + sequence parallelism.

The reference has no sequence/context parallelism (SURVEY §2.9 table:
absent; §5.7 marks it optional TPU headroom).  These tests pin (a) the
rectangular (Nq != Nk) flash kernels against naive attention, fwd and
grads, and (b) the shard_map sequence-parallel wrapper against the
unsharded computation on the 8-virtual-device CPU mesh — including the
automatic reduce-scatter backward for dk/dv.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tests.test_flash_attention import naive_attention, _rand_qkv


def _rand_rect(key, b, h, nq, nk, d):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, nq, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, nk, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, nk, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("nq,nk", [(100, 260), (256, 256), (64, 513),
                                   (300, 128)])
@pytest.mark.parametrize("no_max", [True, False])
def test_rect_flash_matches_naive(nq, nk, no_max):
    from octcubem_tpu.ops.flash_attention import flash_attention_rect

    q, k, v = _rand_rect(jax.random.key(0), 1, 2, nq, nk, 32)
    out = flash_attention_rect(q, k, v, no_max=no_max)
    ref = naive_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)

    def loss_f(q, k, v):
        return (flash_attention_rect(q, k, v, no_max=no_max)
                .astype(jnp.float32) ** 2).sum()

    def loss_n(q, k, v):
        return (naive_attention(q, k, v).astype(jnp.float32) ** 2).sum()

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_n, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)


def test_sequence_parallel_matches_unsharded():
    """8-way sequence-parallel attention == unsharded attention, fwd and
    grads (all_gather transpose reduce-scatters dk/dv)."""
    from octcubem_tpu.parallel.sequence import (sequence_parallel_attention,
                                                shard_sequence)
    from octcubem_tpu.ops.flash_attention import flash_attention

    devices = jax.devices()
    assert len(devices) >= 8
    mesh = Mesh(np.asarray(devices[:8]), ("sp",))

    b, h, n, d = 1, 2, 8 * 48, 32  # N=384 over 8 shards of 48
    q, k, v = _rand_qkv(jax.random.key(7), b, h, n, d)
    ref = flash_attention(q, k, v)

    qs = shard_sequence(q, mesh)
    ks = shard_sequence(k, mesh)
    vs = shard_sequence(v, mesh)
    out = sequence_parallel_attention(qs, ks, vs, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)

    def loss_sp(q, k, v):
        return (sequence_parallel_attention(q, k, v, mesh)
                .astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (naive_attention(q, k, v).astype(jnp.float32) ** 2).sum()

    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(qs, ks, vs)
    g_rf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_sp, g_rf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)
    # outputs/grads stay sequence-sharded
    assert not out.sharding.is_fully_replicated


@pytest.mark.slow  # fast sp cover: test_sequence_parallel_matches_unsharded
def test_transformer_stack_flash_sp_matches_unsharded():
    """A full transformer stack with attn_impl='flash_sp' under an
    8-way sp mesh == the unsharded stack (same params): the attention
    runs the query-sharded shard_map path while LN/MLP partition
    token-wise under pjit."""
    import flax.linen as _  # noqa: F401  (import check)

    from octcubem_tpu.nn.layers import TransformerStack
    from octcubem_tpu.parallel.sequence import (shard_sequence,
                                                use_sequence_parallel)

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices[:8]), ("sp",))
    b, n, dim, heads = 2, 8 * 16, 64, 2  # N=128 over 8 shards of 16

    x = jax.random.normal(jax.random.key(3), (b, n, dim), jnp.float32)
    ref_stack = TransformerStack(2, dim, heads, parity="standard",
                                 attn_impl="naive")
    params = ref_stack.init(jax.random.key(4), x)
    ref = ref_stack.apply(params, x)

    sp_stack = TransformerStack(2, dim, heads, parity="standard",
                                attn_impl="flash_sp")
    xs = shard_sequence(x, mesh, dim=1)
    with use_sequence_parallel(mesh, "sp"):
        out = jax.jit(sp_stack.apply)(params, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)

    # grads agree too (reduce-scattered dk/dv inside the sp boundary)
    def loss(p, x):
        return (sp_stack.apply(p, x).astype(jnp.float32) ** 2).sum()

    def loss_ref(p, x):
        return (ref_stack.apply(p, x).astype(jnp.float32) ** 2).sum()

    with use_sequence_parallel(mesh, "sp"):
        g_sp = jax.jit(jax.grad(loss))(params, xs)
    g_rf = jax.grad(loss_ref)(params, x)
    flat_sp = jax.tree_util.tree_leaves(g_sp)
    flat_rf = jax.tree_util.tree_leaves(g_rf)
    for a, b_ in zip(flat_sp, flat_rf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-3)


def test_flash_sp_requires_context():
    from octcubem_tpu.ops.attention import multi_head_attention_packed

    q = jnp.ones((1, 16, 64))
    with pytest.raises(RuntimeError, match="use_sequence_parallel"):
        multi_head_attention_packed(q, q, q, 2, impl="flash_sp")


def test_ring_attention_matches_unsharded():
    """Ring attention (k/v rotating via ppermute, online logsumexp merge)
    == unsharded attention, fwd and grads, on the 8-way CPU mesh."""
    from octcubem_tpu.parallel.sequence import (ring_attention,
                                                shard_sequence)

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices[:8]), ("sp",))
    b, h, n, d = 2, 2, 8 * 32, 16
    q, k, v = _rand_qkv(jax.random.key(11), b, h, n, d)
    ref = naive_attention(q, k, v)

    qs = shard_sequence(q, mesh)
    ks = shard_sequence(k, mesh)
    vs = shard_sequence(v, mesh)
    out = ring_attention(qs, ks, vs, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh)
                .astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (naive_attention(q, k, v).astype(jnp.float32) ** 2).sum()

    g_r = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qs, ks, vs)
    g_n = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_r, g_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)


def test_ring_attention_grad_memory_o_n_over_sp():
    """The O(N/sp) training-memory claim: the custom-VJP ring backward
    saves only the LOCAL (q, k, v, out, lse) blocks and re-rotates k/v —
    the grad jaxpr must contain NO per-step stacked residual of shape
    [n_sp, bh, n_loc, d], which is exactly what naive lax.scan autodiff
    would save (one visiting (kc, vc) pair per ring step = O(N))."""
    from octcubem_tpu.parallel.sequence import (ring_attention,
                                                shard_sequence)

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices[:8]), ("sp",))
    b, h, n, d = 2, 2, 8 * 32, 16  # per-shard: bh=4, n_loc=32
    q, k, v = _rand_qkv(jax.random.key(13), b, h, n, d)
    qs, ks, vs = (shard_sequence(x, mesh) for x in (q, k, v))

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh)
                .astype(jnp.float32) ** 2).sum()

    txt = str(jax.make_jaxpr(jax.grad(loss_ring, argnums=(0, 1, 2)))(
        qs, ks, vs))
    assert "f32[8,4,32,16]" not in txt, \
        "ring bwd saves per-step stacked k/v residuals (O(N) memory)"


def test_composed_dp_sp_batch_axis():
    """Composed dp x sp: ('data','sp') mesh with the batch sharded over
    'data' and the sequence over 'sp' — sequence_parallel_attention and
    ring_attention both match unsharded attention, fwd and grads."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from octcubem_tpu.parallel.sequence import (ring_attention,
                                                sequence_parallel_attention)

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices[:8]).reshape(2, 4), ("data", "sp"))
    b, h, n, d = 4, 2, 4 * 24, 16
    q, k, v = _rand_qkv(jax.random.key(17), b, h, n, d)
    ref = naive_attention(q, k, v)
    sh = NamedSharding(mesh, P("data", None, "sp", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    for fn in (sequence_parallel_attention, ring_attention):
        out = fn(qs, ks, vs, mesh, "sp", batch_axis="data")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=fn.__name__)

        def loss(q, k, v):
            return (fn(q, k, v, mesh, "sp", batch_axis="data")
                    .astype(jnp.float32) ** 2).sum()

        def loss_ref(q, k, v):
            return (naive_attention(q, k, v).astype(jnp.float32) ** 2).sum()

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs)
        g_n = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g, g_n):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-4, rtol=5e-4,
                                       err_msg=fn.__name__)


@pytest.mark.slow
def test_pretrain_cli_sp_composed_smoke(tmp_path):
    """The config-level sp opt-in: n_sp=2 composes a (data, fsdp, sp)
    mesh and the tiny joint MAE trains a step with attn_impl='flash_sp'
    (the 512² high-res path's sequence-parallel exposure)."""
    import json
    import os

    from octcubem_tpu.cli import pretrain

    out = str(tmp_path / "sp")
    pretrain.main(["--synthetic", "--tiny", "--epochs", "1",
                   "--batch_size", "4", "--steps_per_epoch", "1",
                   "--preset", "vitl_joint_pretrain_sp4",
                   "--output_dir", out])
    with open(os.path.join(out, "log.txt")) as f:
        rows = [json.loads(l) for l in f]
    assert np.isfinite(rows[-1]["train_loss"])


@pytest.mark.parametrize("no_max", [True, False])
def test_sequence_parallel_padded_n_valid(no_max):
    """Padded SP for lengths not divisible by the axis (the flagship
    20480+cls case): N=100 padded to 104 over 8 shards with n_valid=100
    == unsharded attention on the valid region; pad-region k/v grads are
    exactly zero and valid-region grads match."""
    from octcubem_tpu.parallel.sequence import (sequence_parallel_attention,
                                                shard_sequence)

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices[:8]), ("sp",))
    b, h, n_valid, d = 1, 2, 100, 32
    n_pad = 104  # next multiple of 8
    q, k, v = _rand_qkv(jax.random.key(9), b, h, n_pad, d)
    ref = naive_attention(q[:, :, :n_valid], k[:, :, :n_valid],
                          v[:, :, :n_valid])

    qs = shard_sequence(q, mesh)
    ks = shard_sequence(k, mesh)
    vs = shard_sequence(v, mesh)
    out = sequence_parallel_attention(qs, ks, vs, mesh, n_valid=n_valid,
                                      no_max=no_max)
    np.testing.assert_allclose(np.asarray(out)[:, :, :n_valid],
                               np.asarray(ref), atol=5e-5, rtol=5e-5)

    def loss_sp(q, k, v):
        o = sequence_parallel_attention(q, k, v, mesh, n_valid=n_valid,
                                        no_max=no_max)
        return (o[:, :, :n_valid].astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (naive_attention(q[:, :, :n_valid], k[:, :, :n_valid],
                                v[:, :, :n_valid])
                .astype(jnp.float32) ** 2).sum()

    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(qs, ks, vs)
    g_rf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_sp, g_rf):
        a = np.asarray(a)
        np.testing.assert_allclose(a[:, :, :n_valid],
                                   np.asarray(b_)[:, :, :n_valid],
                                   atol=5e-4, rtol=5e-4)
        # pad-region grads are exactly zero (the masking VJP)
        np.testing.assert_array_equal(a[:, :, n_valid:], 0.0)
