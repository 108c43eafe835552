"""Head-sharded tensor parallelism for attention.

The reference's only scaling strategy is DDP (SURVEY §2.9: TP/PP/SP
absent; ViT-L fits per device).  Like parallel/sequence.py this is
TPU-native headroom: attention heads are independent, so the packed
[B, N, H*D] layout shards its minor dimension by head groups over a
``tp`` mesh axis — each device runs the flash kernel on its own heads
with NO collectives inside the attention.  The surrounding projections
partition under pjit once their weights carry tp shardings
(``tp_param_spec``): Wqkv column-sharded (its output IS the head-packed
minor dim), out_proj row-sharded (XLA inserts the psum).
"""

from __future__ import annotations

import contextlib

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .shmap import shard_map


def head_parallel_attention(q, k, v, num_heads: int, mesh: Mesh,
                            axis: str = "tp", scale=None):
    """q, k, v: [B, N, H*D] with the minor (head-packed) dim sharded over
    ``axis`` -> [B, N, H*D] sharded the same way.  Differentiable; each
    shard runs attention over its own head group, so the backward is
    collective-free too."""
    from ..ops.attention import multi_head_attention_packed

    n_tp = mesh.shape[axis]
    assert num_heads % n_tp == 0, (num_heads, n_tp)

    def local(ql, kl, vl):
        return multi_head_attention_packed(ql, kl, vl, num_heads // n_tp,
                                           scale=scale, impl="auto")

    spec = P(None, None, axis)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_rep=False)(q, k, v)


def tp_param_spec(path, leaf, axis: str = "tp"):
    """PartitionSpec for transformer params under head parallelism:
    Wqkv / fc1 kernels column-sharded (output dim), out_proj / fc2
    row-sharded (input dim, psum on the output), everything else
    replicated.  Compose with jax.tree_util.tree_map_with_path like
    core.mesh.fsdp_param_spec."""
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    if leaf.ndim != 2:
        return P()
    if any(n in ("Wqkv", "fc1") for n in names):
        return P(None, axis)       # column parallel
    if any(n in ("out_proj", "fc2") for n in names):
        return P(axis, None)       # row parallel
    return P()


# ---- model integration: attn_impl="flash_tp" (trace-time context, the
# same pattern as parallel.sequence.use_sequence_parallel)

_TP_CONTEXT: list[tuple[Mesh, str]] = []


@contextlib.contextmanager
def use_tensor_parallel(mesh: Mesh, axis: str = "tp"):
    _TP_CONTEXT.append((mesh, axis))
    try:
        yield
    finally:
        _TP_CONTEXT.pop()


def current_tp() -> tuple[Mesh, str]:
    if not _TP_CONTEXT:
        raise RuntimeError(
            "attn_impl='flash_tp' requires an active use_tensor_parallel "
            "(mesh, axis) context at trace time")
    return _TP_CONTEXT[-1]


def shard_tp_params(params, mesh: Mesh, axis: str = "tp"):
    """Place a param tree with tp_param_spec shardings."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: jax.device_put(
            x, NamedSharding(mesh, tp_param_spec(p, x, axis))), params)
