"""Head-sharded tensor parallelism (parallel/tensor.py).

The reference has no tensor parallelism (SURVEY §2.9: absent); this is
TPU-native headroom.  Tests pin (a) head-parallel attention == unsharded
attention (heads are independent), and (b) a full transformer stack with
attn_impl='flash_tp' + tp-sharded weights == the unsharded stack, fwd
and grads, on the 8-virtual-device CPU mesh.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def test_head_parallel_attention_matches_unsharded():
    from octcubem_tpu.ops.attention import multi_head_attention_packed
    from octcubem_tpu.parallel.tensor import head_parallel_attention

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices[:8]), ("tp",))
    b, n, heads, d = 2, 64, 8, 16  # 1 head per device
    hd = heads * d
    key = jax.random.key(0)
    q, k, v = (jax.random.normal(kk, (b, n, hd), jnp.float32)
               for kk in jax.random.split(key, 3))
    ref = multi_head_attention_packed(q, k, v, heads, impl="naive")

    spec = NamedSharding(mesh, P(None, None, "tp"))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = head_parallel_attention(qs, ks, vs, heads, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)

    # grads agree and stay collective-free per shard
    def loss_tp(q, k, v):
        return (head_parallel_attention(q, k, v, heads, mesh)
                .astype(jnp.float32) ** 2).sum()

    def loss_rf(q, k, v):
        return (multi_head_attention_packed(q, k, v, heads, impl="naive")
                .astype(jnp.float32) ** 2).sum()

    g_tp = jax.jit(jax.grad(loss_tp, argnums=(0, 1, 2)))(qs, ks, vs)
    g_rf = jax.grad(loss_rf, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_tp, g_rf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)


@pytest.mark.slow  # fast tp cover: test_head_parallel_attention_matches_unsharded
def test_transformer_stack_flash_tp_matches_unsharded():
    """Full stack under tp: Wqkv/fc1 column-sharded, out_proj/fc2
    row-sharded (tp_param_spec), attention head-sharded via flash_tp —
    outputs and all parameter grads match the unsharded stack."""
    from octcubem_tpu.nn.layers import TransformerStack
    from octcubem_tpu.parallel.tensor import (shard_tp_params,
                                              use_tensor_parallel)

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices[:8]), ("tp",))
    b, n, dim, heads = 2, 48, 128, 8  # d=16 per head, 1 head/device

    x = jax.random.normal(jax.random.key(3), (b, n, dim), jnp.float32)
    ref_stack = TransformerStack(2, dim, heads, parity="standard",
                                 attn_impl="naive")
    params = ref_stack.init(jax.random.key(4), x)
    ref = ref_stack.apply(params, x)

    tp_stack = TransformerStack(2, dim, heads, parity="standard",
                                attn_impl="flash_tp")
    tparams = shard_tp_params(params, mesh)
    with use_tensor_parallel(mesh, "tp"):
        out = jax.jit(tp_stack.apply)(tparams, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)

    def loss(p, x):
        return (tp_stack.apply(p, x).astype(jnp.float32) ** 2).sum()

    def loss_ref(p, x):
        return (ref_stack.apply(p, x).astype(jnp.float32) ** 2).sum()

    with use_tensor_parallel(mesh, "tp"):
        g_tp = jax.jit(jax.grad(loss))(tparams, x)
    g_rf = jax.grad(loss_ref)(params, x)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_tp),
                     jax.tree_util.tree_leaves(g_rf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-3)


def test_flash_tp_requires_context():
    from octcubem_tpu.ops.attention import multi_head_attention_packed

    q = jnp.ones((1, 16, 64))
    with pytest.raises(RuntimeError, match="use_tensor_parallel"):
        multi_head_attention_packed(q, q, q, 2, impl="flash_tp")
