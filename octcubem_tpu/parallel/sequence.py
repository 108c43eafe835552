"""Sequence parallelism for long-token attention.

The reference has no sequence/context parallelism (SURVEY §2.9/§5.7:
flash attention + 90% masking keep the 5k-20k-token sequences on one
device); this is the TPU-native headroom SURVEY §5.7 marks optional —
for multi-chip training at the 512² high-res grid (20k+ tokens) or
longer volumes, attention itself can shard over the sequence.

Design (the non-causal full-attention case): queries shard over an
``sp`` mesh axis; each shard all-gathers the key/value set over ICI and
runs the rectangular flash kernel on its query slice.  Under jax
autodiff the all_gather's transpose is a psum_scatter, so the backward
reduce-scatters dk/dv across shards automatically — no hand-written
collective backward.  Memory per chip: O(N/sp) activations for q/out
and O(N) for the gathered k/v (transient); score memory stays O(block²)
in the kernel.  A ring schedule (ppermute with per-step kernel calls)
would also bound k/v memory at O(N/sp) but serializes sp kernel launches;
at the model's token counts the gather fits comfortably, so the simpler
all-gather form is used.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.flash_attention import flash_attention_rect
from .shmap import shard_map  # noqa: F401  (re-exported; pre-shim import path)


def sequence_parallel_attention(q, k, v, mesh: Mesh, axis: str = "sp",
                                scale: float | None = None,
                                no_max: bool = True,
                                n_valid: int | None = None,
                                batch_axis: str | None = None):
    """q, k, v: [B, H, N, D] with N sharded over ``axis`` -> [B, H, N, D]
    sharded the same way.  Differentiable; grads of k/v are
    reduce-scattered back to their shards by the all_gather transpose.

    N must be divisible by the axis size; sequences that are not (e.g.
    the flagship 20480-token high-res grid + cls = 20481) get PADDED to
    the next multiple by the caller, passing the true length as
    ``n_valid``: the pad tail of k/v is zeroed here (so the kernel's
    correction is exact and the zeroing VJP discards the tail's grad
    contributions) and masked out of every query's softmax; pad QUERY
    rows produce garbage the caller slices off.

    batch_axis: optional mesh axis the BATCH dim is sharded over — the
    composed dp x sp case (mesh ('data','sp')); None replicates batch
    across the sp groups.

    The kv gather happens inside shard_map so XLA emits one ICI
    all-gather per tensor, overlapping with the first kernel tiles
    where possible.
    """
    import jax.numpy as jnp

    n = q.shape[2]
    n_sp = mesh.shape[axis]
    assert n % n_sp == 0, (n, n_sp)
    if n_valid is not None and n_valid < n:
        keep = (jnp.arange(n) < n_valid)[None, None, :, None]
        k = jnp.where(keep, k, 0)
        v = jnp.where(keep, v, 0)
    kv_valid = n_valid

    def local(ql, kl, vl):
        kf = jax.lax.all_gather(kl, axis, axis=2, tiled=True)
        vf = jax.lax.all_gather(vl, axis, axis=2, tiled=True)
        return flash_attention_rect(ql, kf, vf, scale=scale, no_max=no_max,
                                    kv_valid=kv_valid)

    spec = P(batch_axis, None, axis, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_rep=False)(q, k, v)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "sp",
                   scale: float | None = None,
                   batch_axis: str | None = None):
    """Ring attention with O(N/sp) k/v memory per chip — in BOTH
    directions of autodiff.  Each shard's key/value block rotates around
    the ring (ppermute) while every query shard folds the visiting block
    into its online-softmax state via the kernel's logsumexp output (the
    blockwise/ring formulation of flash attention).

    q, k, v: [B, H, N, D] with N sharded over ``axis``.  The backward is
    a hand-written custom VJP that re-rotates k/v around the ring and
    accumulates (dk, dv) in travelling accumulators that arrive home
    after a full cycle, so training memory stays O(N/sp): the only saved
    residuals are the local (q, k, v, out, lse) blocks — the naive
    lax.scan autodiff would instead save every visiting (kc, vc) pair,
    i.e. O(N) per chip.  Each ring step's (q_i, k_j) pair gradient uses
    the GLOBAL lse/out, which makes the per-pair fused flash backward
    exact for the global softmax.  (Second-order autodiff through the
    hand-written bwd is not supported.)

    batch_axis: optional mesh axis the batch dim is sharded over
    (composed dp x sp).  Use when the gathered k/v of
    sequence_parallel_attention would not fit; for the model's native
    token counts the all-gather form is faster (one collective instead
    of sp serialized kernel calls)."""
    import jax.numpy as jnp

    from ..ops.flash_attention import (BWD_BLOCK_TARGET, FWD_BLOCK_TARGET,
                                       _bwd_rect_core, _bwd_rect_prepare,
                                       _flash_bh_rect, _pick_block)

    b, h, n, d = q.shape
    n_sp = mesh.shape[axis]
    assert n % n_sp == 0, (n, n_sp)
    n_loc = n // n_sp
    if scale is None:
        scale = d ** -0.5
    block_q = _pick_block(n_loc, FWD_BLOCK_TARGET)
    block_k = _pick_block(n_loc, FWD_BLOCK_TARGET)
    perm = [(i, (i + 1) % n_sp) for i in range(n_sp)]

    def local(ql, kl, vl):
        bh = ql.shape[0] * h
        ql = ql.reshape(bh, n_loc, d)
        kl = kl.reshape(bh, n_loc, d)
        vl = vl.reshape(bh, n_loc, d)

        def fwd_scan(ql, kl, vl):
            def step(carry, _):
                out, lse, kc, vc = carry
                o_i, l_i = _flash_bh_rect(ql, kc, vc, float(scale), block_q,
                                          block_k, True)
                new_lse = jnp.logaddexp(lse, l_i)
                w_old = jnp.exp(lse - new_lse)[..., None]
                w_new = jnp.exp(l_i - new_lse)[..., None]
                out = out * w_old + o_i.astype(jnp.float32) * w_new
                kc = jax.lax.ppermute(kc, axis, perm)
                vc = jax.lax.ppermute(vc, axis, perm)
                return (out, new_lse, kc, vc), None

            out0 = jnp.zeros((bh, n_loc, d), jnp.float32)
            lse0 = jnp.full((bh, n_loc), -jnp.inf, jnp.float32)
            (out, lse, _, _), _ = jax.lax.scan(
                step, (out0, lse0, kl, vl), None, length=n_sp)
            return out.astype(q.dtype), lse

        @jax.custom_vjp
        def ring(ql, kl, vl):
            return fwd_scan(ql, kl, vl)[0]

        def ring_fwd(ql, kl, vl):
            out, lse = fwd_scan(ql, kl, vl)
            return out, (ql, kl, vl, out, lse)

        def ring_bwd(res, dout):
            ql, kl, vl, out, lse = res
            zero_lse_ct = jnp.zeros_like(lse)
            # hoist the k/v-independent work out of the ring scan: the
            # delta term and the query-side padding depend only on
            # (dout, out, lse), none of which rotate — recomputing them
            # per step would do n_sp redundant reductions + pad copies
            bwd_bq = _pick_block(n_loc, BWD_BLOCK_TARGET)
            bwd_bk = _pick_block(n_loc, BWD_BLOCK_TARGET)
            qp, gp, lsep, deltap, _ = _bwd_rect_prepare(
                ql, dout, out, lse, zero_lse_ct, bwd_bq)

            def step(carry, _):
                kc, vc, dkc, dvc, dq = carry
                # per-pair fused flash bwd with the GLOBAL out/lse: the
                # recomputed P_ij = exp(s*scale - lse) is the global
                # softmax restricted to this k block, so dq/dk/dv
                # contributions are exact partial sums
                dq_p, dk_p, dv_p = _bwd_rect_core(
                    float(scale), bwd_bq, bwd_bk, True, None,
                    qp, kc, vc, gp, lsep, deltap, n_loc)
                dq = dq + dq_p.astype(jnp.float32)
                dkc = dkc + dk_p.astype(jnp.float32)
                dvc = dvc + dv_p.astype(jnp.float32)
                # (k, v) and their grad accumulators travel TOGETHER so
                # after the full n_sp cycle each dk/dv block is home with
                # every query shard's contribution
                kc, vc, dkc, dvc = (jax.lax.ppermute(x, axis, perm)
                                    for x in (kc, vc, dkc, dvc))
                return (kc, vc, dkc, dvc, dq), None

            zeros_kv = jnp.zeros((bh, n_loc, d), jnp.float32)
            (_, _, dk, dv, dq), _ = jax.lax.scan(
                step, (kl, vl, zeros_kv, zeros_kv, zeros_kv), None,
                length=n_sp)
            return (dq.astype(ql.dtype), dk.astype(kl.dtype),
                    dv.astype(vl.dtype))

        ring.defvjp(ring_fwd, ring_bwd)
        return ring(ql, kl, vl).reshape(-1, h, n_loc, d)

    spec = P(batch_axis, None, axis, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_rep=False)(q, k, v)


def shard_sequence(x, mesh: Mesh, axis: str = "sp", dim: int = 2):
    """Place x with its ``dim`` axis sharded over the mesh ``axis``."""
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


# ---- model integration: attn_impl="flash_sp" -------------------------
#
# The attention dispatch (ops/attention.multi_head_attention_packed)
# reads the active (mesh, axis) from this trace-time context, so models
# opt in with attn_impl="flash_sp" without threading a Mesh attribute
# through every module:
#
#     with use_sequence_parallel(mesh, "sp"):
#         step = jax.jit(...)   # traced inside the context
#
# Everything around the attention (LN / MLP / projections) partitions
# token-wise automatically under pjit once the activations are sharded
# over the sequence axis; only the Pallas kernel needs the explicit
# shard_map boundary.

import contextlib

_SP_CONTEXT: list[tuple[Mesh, str, str | None]] = []


@contextlib.contextmanager
def use_sequence_parallel(mesh: Mesh, axis: str = "sp",
                          batch_axis: str | None = None):
    """batch_axis: mesh axis the batch dim is sharded over for the
    composed dp x sp case (e.g. Mesh ('data','sp') with
    batch_axis='data'); None = batch replicated across sp groups."""
    _SP_CONTEXT.append((mesh, axis, batch_axis))
    try:
        yield
    finally:
        _SP_CONTEXT.pop()


def current_sp() -> tuple[Mesh, str, str | None]:
    if not _SP_CONTEXT:
        raise RuntimeError(
            "attn_impl='flash_sp' requires an active use_sequence_parallel "
            "(mesh, axis) context at trace time")
    return _SP_CONTEXT[-1]
