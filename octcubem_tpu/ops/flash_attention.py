"""Pallas flash attention for TPU (fwd + bwd), bidirectional (non-causal).

TPU-native replacement for the reference's flash-attn 2.5.2 CUDA kernels
(imported at OCTCube/models_mae_flash_attn.py:24 etc. — SURVEY.md §2.9).
Tiled online-softmax over [B*H, N, D] with fp32 accumulators in VMEM; the
k-block loop is the innermost grid dimension so accumulator scratch persists
across it.  Sequences are padded to the block size and padded keys are
masked with -inf via a broadcasted-iota comparison (only emitted when the
padding actually exists).

Backward follows the FlashAttention-2 scheme — the forward saves only
(out, logsumexp) — but dq/dk/dv come from a single FUSED kernel: one
sweep over (k-block, q-block) tiles recomputes s and p once per tile
(instead of twice across split dq / dkv kernels), with dq accumulating in
a persistent full-sequence VMEM scratch.  delta = rowsum(dO * O) is
precomputed by XLA.
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
# ~1.45x faster than 512 (9.9ms vs 14.3ms); the fused bwd keeps 512 tiles
# so its f32 s/p/dp/ds intermediates plus the full-sequence dq accumulator
# stay within the ~16MB VMEM scoped limit.
FWD_BLOCK_TARGET = 1024
BWD_BLOCK_TARGET = 512


def _use_interpret() -> bool:
    return jax.local_devices()[0].platform not in ("tpu", "axon")


# ---------------------------------------------------------------- forward
#
# Two forward variants:
# - _fwd_kernel: textbook online softmax (running max + rescale) — the
#   fully general path.
# - _fwd_kernel_nomax: fixed-shift softmax.  The fwd is VPU-bound on the
#   elementwise passes over the [bq, bk] score tile (max-reduce, sub+exp,
#   rescale); with p = exp(min(s, CLAMP) - SHIFT) the max-reduce and the
#   accumulator rescale disappear.  Mathematically exact for any logits
#   below CLAMP (softmax is shift-invariant; clamping at CLAMP=40 only
#   alters keys whose weights already saturate), and f32 holds
#   e^(CLAMP-SHIFT)=e^24 with full relative precision.  lse = SHIFT +
#   log(l) keeps the backward identical.

NOMAX_SHIFT = 16.0
NOMAX_CLAMP = 40.0


def _fwd_kernel_nomax(q_ref, k_ref, v_ref, o_ref, lse_ref,
                      acc_ref, l_ref, *, scale, n_valid, block_k):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if n_valid % block_k != 0:
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, NEG_INF)
    p = jnp.exp(jnp.minimum(s, NOMAX_CLAMP) - NOMAX_SHIFT)  # [bq, bk] f32
    l_ref[:] = l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == nk - 1)
    def _finalize():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = NOMAX_SHIFT + jnp.log(l_safe)


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


def _normalize_blocks(block_q: int, block_k: int) -> tuple[int, int]:
    """The grid uses nq = n_pad // block_q and nk = n_pad // block_k with
    n_pad rounded to max(block_q, block_k); if the larger block is not a
    multiple of the smaller, the integer division truncates and whole
    q-blocks (or k-blocks) are silently skipped.  Force divisibility by
    collapsing to the larger block when they don't divide evenly."""
    if block_q == block_k:
        return block_q, block_k
    big, small = max(block_q, block_k), min(block_q, block_k)
    if big % small != 0:
        return big, big
    return block_q, block_k


def _fwd(q, k, v, scale, block_q, block_k, no_max: bool = True):
    bh, n, d = q.shape
    block_q, block_k = _normalize_blocks(block_q, block_k)
    n_pad = _round_up(n, max(block_q, block_k))
    pad = n_pad - n
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    nq, nk = n_pad // block_q, n_pad // block_k

    if no_max:
        kernel = functools.partial(_fwd_kernel_nomax, scale=scale, n_valid=n,
                                   block_k=block_k)
        scratch = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ]
    else:
        kernel = functools.partial(_fwd_kernel, scale=scale, n_valid=n,
                                   block_k=block_k)
        scratch = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ]

    out, lse = pl.pallas_call(
        kernel,
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
        scratch_shapes=scratch,
        interpret=_use_interpret(),
    )(q, k, v)
    return out[:, :n], lse[:, :n, 0]


# ---------------------------------------------------------------- backward
#
# Fused single-pass backward: one sweep over (k-block, q-block) tiles
# computes s = qk^T and p = exp(s - lse) ONCE per tile and produces all
# three gradients (the split dq / dkv kernels recompute s and the exp
# twice — measured 28ms vs ~18ms per ViT-L-decoder layer on v5e).
# dq accumulates in a persistent full-sequence VMEM scratch
# ([n_pad, d] f32, ~0.8MB at n=6144, d=32) that survives across grid
# steps; dk/dv accumulate per k-block as usual.

def _fused_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dq_ref, dk_ref, dv_ref,
                      dq_acc, dk_acc, dv_acc, *, scale, n_valid,
                      block_q, block_k, no_max):
    jb = pl.program_id(1)   # k-block index (outer)
    ib = pl.program_id(2)   # q-block index (inner)
    nj = pl.num_programs(1)
    ni = pl.num_programs(2)

    @pl.when((jb == 0) & (ib == 0))
    def _init_dq():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    @pl.when(ib == 0)
    def _init_dkv():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]    # [bq, d]
    k = k_ref[0]    # [bk, d]
    v = v_ref[0]    # [bk, d]
    do = do_ref[0]  # [bq, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                          # [bq, bk]
    if n_valid % block_k != 0:
        col = jb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, NEG_INF)
    # padded q rows have lse = 0 -> p = exp(NEG_INF) = 0, harmless
    if no_max:
        # match the nomax forward exactly: it computed p from logits
        # clamped at NOMAX_CLAMP, so the recomputed p must clamp too, and
        # d(exp(min(s, C)))/ds = 0 where the clamp engaged.
        clamped = s > NOMAX_CLAMP
        p = jnp.exp(jnp.minimum(s, NOMAX_CLAMP) - lse_ref[0])  # [bq, bk]
    else:
        p = jnp.exp(s - lse_ref[0])                    # [bq, bk]

    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [bk, d]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [bq, bk]
    ds = p * (dp - delta_ref[0])                       # [bq, bk]
    if no_max:
        ds = jnp.where(clamped, 0.0, ds)
    ds = ds.astype(q.dtype)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # [bk, d]
    dq_tile = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # [bq, d]
    dq_acc[pl.ds(ib * block_q, block_q), :] = (
        dq_acc[pl.ds(ib * block_q, block_q), :] + dq_tile)

    @pl.when(ib == ni - 1)
    def _write_dkv():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)

    @pl.when((jb == nj - 1) & (ib == ni - 1))
    def _write_dq():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd(scale, block_q, block_k, no_max, res, g):
    q, k, v, out, lse = res
    bh, n, d = q.shape
    block_q = _pick_block(n, BWD_BLOCK_TARGET)
    block_k = _pick_block(n, BWD_BLOCK_TARGET * 2)  # wider k tile: ~9MB VMEM
    # e.g. n=577: naive picks (512, 640); 640 % 512 != 0 would truncate
    # nq and silently skip q rows >= 512 (dq tail exactly zero)
    block_q, block_k = _normalize_blocks(block_q, block_k)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    n_pad = _round_up(n, max(block_q, block_k))
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

    # fused single-pass backward: grid (bh, k-blocks, q-blocks)
    specs = [
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),   # q
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),   # k
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),   # v
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),   # do
        pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),   # lse
        pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),   # delta
    ]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, scale=scale, n_valid=n,
                          block_q=block_q, block_k=block_k, no_max=no_max),
        grid=(bh, nk, nq),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, n_pad, d), lambda b, j, i: (b, 0, 0)),  # dq
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, d), jnp.float32),     # dq accumulator
            pltpu.VMEM((block_k, d), jnp.float32),   # dk accumulator
            pltpu.VMEM((block_k, d), jnp.float32),   # dv accumulator
        ],
        interpret=_use_interpret(),
    )(q, k, v, g, lse, delta)

    return dq[:, :n], dk[:, :n], dv[:, :n]


# ---------------------------------------------------------------- public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_bh(q, k, v, scale, block_q, block_k, no_max):
    out, _ = _fwd(q, k, v, scale, block_q, block_k, no_max=no_max)
    return out


def _flash_bh_fwd(q, k, v, scale, block_q, block_k, no_max):
    out, lse = _fwd(q, k, v, scale, block_q, block_k, no_max=no_max)
    return out, (q, k, v, out, lse)


_flash_bh.defvjp(_flash_bh_fwd, _bwd)


def flash_attention(q, k, v, scale: float | None = None,
                    block_q: int | None = None, block_k: int | None = None,
                    no_max: bool = True):
    """q, k, v: [B, H, N, D] -> [B, H, N, D].  Differentiable.

    no_max=True uses the fixed-shift softmax forward (faster; exact as
    long as scaled logits stay below NOMAX_CLAMP=40 — clamped keys'
    weights already saturate, and the backward applies the same clamp so
    fwd/bwd agree).  no_max=False selects the textbook online-softmax
    kernel, exact for any logit range.
    """
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
    out = _flash_bh(qf, kf, vf, float(scale), block_q, block_k, bool(no_max))
    return out.reshape(b, h, n, d)
