"""Pallas flash attention for TPU (fwd + bwd), bidirectional (non-causal).

TPU-native replacement for the reference's flash-attn 2.5.2 CUDA kernels
(imported at OCTCube/models_mae_flash_attn.py:24 etc. — SURVEY.md §2.9).
Tiled online-softmax over [B*H, N, D] with fp32 accumulators in VMEM; the
k-block loop is the innermost grid dimension so accumulator scratch persists
across it.  Sequences are padded to the block size and padded keys are
masked with -inf via a broadcasted-iota comparison (only emitted when the
padding actually exists).

Backward follows the FlashAttention-2 scheme: the forward saves only
(out, logsumexp); dq is computed in one kernel (grid over q blocks,
loop over k), dk/dv in another (grid over k blocks, loop over q), with
delta = rowsum(dO * O) precomputed by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_block(n: int, target: int = 512) -> int:
    return min(target, _round_up(n, 128))


# Measured on v5e (dec shape BH=64, N=5121, dh=32): fwd 1024-blocks run
# ~1.45x faster than 512 (9.9ms vs 14.3ms); bwd kernels use asymmetric
# tiles — 512 on the output-block dim, 1024 on the inner loop dim — to get
# the larger-tile win while the f32 s/p/dp/ds intermediates stay within the
# ~16MB VMEM scoped limit.
FWD_BLOCK_TARGET = 1024
BWD_OUT_BLOCK_TARGET = 512
BWD_LOOP_BLOCK_TARGET = 1024


def _use_interpret() -> bool:
    return jax.local_devices()[0].platform not in ("tpu", "axon")


# ---------------------------------------------------------------- forward

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, scale, n_valid, block_k):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]

    if n_valid % block_k != 0:
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, NEG_INF)

    m_prev = m_ref[:]                                 # [bq, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)        # [bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                            # [bq, bk] f32

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(kb == nk - 1)
    def _finalize():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = m_ref[:] + jnp.log(l_safe)  # [bq, 1]


def _fwd(q, k, v, scale, block_q, block_k):
    bh, n, d = q.shape
    n_pad = _round_up(n, max(block_q, block_k))
    pad = n_pad - n
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    nq, nk = n_pad // block_q, n_pad // block_k

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n, block_k=block_k),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(q, k, v)
    return out[:, :n], lse[:, :n, 0]


# ---------------------------------------------------------------- backward

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               acc_ref, *, scale, n_valid, block_k):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if n_valid % block_k != 0:
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0])                       # [bq, bk]; lse [bq, 1]
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0])                      # [bq, bk] f32
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] + dq * scale

    @pl.when(kb == nk - 1)
    def _finalize():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, scale, n_valid, block_q):
    qb = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]   # [bq, d]
    k = k_ref[0]   # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale      # [bq, bk]
    if n_valid % block_q != 0:
        row = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(row < n_valid, s, NEG_INF)
    # padded q rows have lse = 0 -> p = exp(-inf - 0) = 0, harmless
    p = jnp.exp(s - lse_ref[0])                       # [bq, bk]; lse [bq, 1]
    do = do_ref[0]  # [bq, d]
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bk, d]
    dv_acc[:] = dv_acc[:] + dv
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, bk]
    ds = p * (dp - delta_ref[0])
    dk = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bk, d]
    dk_acc[:] = dk_acc[:] + dk * scale

    @pl.when(qb == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd(scale, block_q, block_k, res, g):
    q, k, v, out, lse = res
    bh, n, d = q.shape
    # bwd tiling is independent of the fwd blocks: dq iterates k-blocks for
    # each q-block (bigger k tile), dkv iterates q-blocks for each k-block
    # (bigger q tile)
    block_q = _pick_block(n, BWD_OUT_BLOCK_TARGET)
    block_k = _pick_block(n, BWD_LOOP_BLOCK_TARGET)
    dkv_block_k = _pick_block(n, BWD_OUT_BLOCK_TARGET)
    dkv_block_q = _pick_block(n, BWD_LOOP_BLOCK_TARGET)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    n_pad = _round_up(n, max(block_q, block_k, dkv_block_q, dkv_block_k))
    pad = n_pad - n
    if pad:
        zpad3 = ((0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, zpad3)
        k = jnp.pad(k, zpad3)
        v = jnp.pad(v, zpad3)
        g = jnp.pad(g, zpad3)
        lse = jnp.pad(lse, ((0, 0), (0, pad)))
        delta = jnp.pad(delta, ((0, 0), (0, pad)))
    lse = lse[..., None]      # [bh, n_pad, 1]
    delta = delta[..., None]  # [bh, n_pad, 1]
    nq, nk = n_pad // block_q, n_pad // block_k

    tensor_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),   # q
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),   # k
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),   # v
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),   # do
        pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),   # lse
        pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),   # delta
    ]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, n_valid=n, block_k=block_k),
        grid=(bh, nq, nk),
        in_specs=tensor_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=_use_interpret(),
    )(q, k, v, g, lse, delta)

    # dk/dv: grid over k blocks (dim 1), loop over q blocks (dim 2)
    bq2, bk2 = dkv_block_q, dkv_block_k
    kv_specs = [
        pl.BlockSpec((1, bq2, d), lambda b, j, i: (b, i, 0)),   # q
        pl.BlockSpec((1, bk2, d), lambda b, j, i: (b, j, 0)),   # k
        pl.BlockSpec((1, bk2, d), lambda b, j, i: (b, j, 0)),   # v
        pl.BlockSpec((1, bq2, d), lambda b, j, i: (b, i, 0)),   # do
        pl.BlockSpec((1, bq2, 1), lambda b, j, i: (b, i, 0)),   # lse
        pl.BlockSpec((1, bq2, 1), lambda b, j, i: (b, i, 0)),   # delta
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, n_valid=n, block_q=bq2),
        grid=(bh, n_pad // bk2, n_pad // bq2),
        in_specs=kv_specs,
        out_specs=[
            pl.BlockSpec((1, bk2, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk2, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk2, d), jnp.float32),
            pltpu.VMEM((bk2, d), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(q, k, v, g, lse, delta)

    return dq[:, :n], dk[:, :n], dv[:, :n]


# ---------------------------------------------------------------- public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_bh(q, k, v, scale, block_q, block_k):
    out, _ = _fwd(q, k, v, scale, block_q, block_k)
    return out


def _flash_bh_fwd(q, k, v, scale, block_q, block_k):
    out, lse = _fwd(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


_flash_bh.defvjp(_flash_bh_fwd, _bwd)


def flash_attention(q, k, v, scale: float | None = None,
                    block_q: int | None = None, block_k: int | None = None):
    """q, k, v: [B, H, N, D] -> [B, H, N, D].  Differentiable."""
    b, h, n, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if block_q is None:
        block_q = _pick_block(n, FWD_BLOCK_TARGET)
    if block_k is None:
        block_k = _pick_block(n, FWD_BLOCK_TARGET)
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    out = _flash_bh(qf, kf, vf, float(scale), block_q, block_k)
    return out.reshape(b, h, n, d)
