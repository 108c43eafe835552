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
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_block(n: int, target: int = 512) -> int:
    """Pick a square tile size <= target minimizing padded score area.

    The kernels are bound by producing the [n_pad, n_pad] score elements
    (measured: stripping exp/rowsum changes nothing at the ViT-L decoder
    shape), so padding waste dominates; a mild penalty models the
    per-tile overhead that makes very small tiles slow.  Calibrated on
    v5e at N=5121: 896-tiles (n_pad 5376) beat 1024 (n_pad 6144) by 16%
    fwd; 768x768 beats the old 512x1024 bwd by 18%.
    """
    best_b = 128
    best_cost = None
    for b in range(128, target + 1, 128):
        pad = _round_up(n, b)
        cost = pad * pad * (0.7 + 0.3 * target / b)
        if best_cost is None or cost < best_cost:
            best_cost, best_b = cost, b
    return best_b


# Measured on v5e at the ViT-L decoder shape (BH=64, N=5120+cls, d=32):
# fwd 1024-tiles on the exactly-tiled 5120 core = 6.7ms; bwd 1024-tiles
# (needs the raised VMEM limit below) = 13.8ms vs 14.6 at 640 / ~20 at
# 896-padded.  The cost model in _pick_block reproduces these choices.
FWD_BLOCK_TARGET = 1024
BWD_BLOCK_TARGET = 1024


# Raise the per-kernel scoped-VMEM ceiling (v5e has 128MB physical
# VMEM; the default ~16MB limit rejects 1024-wide bwd tiles).
_VMEM_LIMIT = 100 * 1024 * 1024


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
                      acc_ref, l_ref, *, scale, n_valid, block_k, n_pad):
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
    # No per-tile pad masking: zero-padded k rows give s = 0 exactly, so
    # every pad column contributes exactly e^-SHIFT to l (corrected by a
    # compile-time constant at finalize) and 0 to acc (v pad rows are 0).
    # f32 cancellation in the correction only matters for rows whose max
    # scaled logit < ~-9 (true mass << pad mass) — far outside the range
    # real attention rows produce.
    p = jnp.exp(jnp.minimum(s, NOMAX_CLAMP) - NOMAX_SHIFT)  # [bq, bk] f32
    l_ref[:] = l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == nk - 1)
    def _finalize():
        pad_l = math.exp(-NOMAX_SHIFT) * (n_pad - n_valid)
        l = l_ref[:] - pad_l
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = NOMAX_SHIFT + jnp.log(l_safe)


def _fwd_kernel_nomax_cls(q_ref, k_ref, v_ref, kc_ref, vc_ref,
                          o_ref, lse_ref, acc_ref, l_ref,
                          *, scale, n_valid, block_k, n_pad, k_axis=2):
    """nomax forward with one extra (cls) key/value folded in at the
    finalize step — everything stays in VMEM, so a cls-prefixed sequence
    (n = m*128 + 1) runs its n-1 tokens on an exactly-tiled grid with no
    padding waste (5121 -> core 5120 instead of 5376; 513 -> 512)."""
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    p = jnp.exp(jnp.minimum(s, NOMAX_CLAMP) - NOMAX_SHIFT)
    l_ref[:] = l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == nk - 1)
    def _finalize():
        # mul+reduce instead of a [bq,d]@[d,1] dot: Mosaic can't lower
        # N=1 mixed-dtype matmuls, and a VPU reduce is cheap at d=32
        s_cls = jnp.sum(
            q.astype(jnp.float32) * kc_ref[0].astype(jnp.float32),
            axis=1, keepdims=True) * scale                     # [bq, 1]
        p_cls = jnp.exp(jnp.minimum(s_cls, NOMAX_CLAMP) - NOMAX_SHIFT)
        pad_l = math.exp(-NOMAX_SHIFT) * (n_pad - n_valid)
        l = l_ref[:] + p_cls - pad_l
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        acc = acc_ref[:] + p_cls * vc_ref[0].astype(jnp.float32)
        o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
        lse_ref[0] = NOMAX_SHIFT + jnp.log(l_safe)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, scale, n_valid, block_k, n_pad):
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

    if n_valid < n_pad:
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
                                   block_k=block_k, n_pad=n_pad)
        scratch = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ]
    else:
        kernel = functools.partial(_fwd_kernel, scale=scale, n_valid=n,
                                   block_k=block_k, n_pad=n_pad)
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_use_interpret(),
    )(q, k, v)
    return out[:, :n], lse[:, :n, 0]


def _fwd_cls(q, k, v, kc, vc, scale, block):
    """Forward over n-1 tokens with the cls key/value folded in-kernel.
    q/k/v: [bh, n_tok, d]; kc/vc: [bh, 1, d] -> (out [bh, n_tok, d],
    lse [bh, n_tok]) where lse includes the cls mass."""
    bh, n, d = q.shape
    n_pad = _round_up(n, block)
    pad = n_pad - n
    if pad:
        zp = ((0, 0), (0, pad), (0, 0))
        q, k, v = jnp.pad(q, zp), jnp.pad(k, zp), jnp.pad(v, zp)
    nt = n_pad // block
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_nomax_cls, scale=scale, n_valid=n,
                          block_k=block, n_pad=n_pad),
        grid=(bh, nt, nt),
        in_specs=[
            pl.BlockSpec((1, block, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, d), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda b, i, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, d), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_use_interpret(),
    )(q, k, v, kc, vc)
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
    # No pad-column masking needed in the backward: pad columns of p/ds
    # only ever multiply zero-padded k/v rows (dq, dp) or land in pad ROWS
    # of dk/dv (ds^T@q, p^T@do), which the caller slices off.  Pad q rows
    # produce ds = 0 (do and delta are zero-padded).
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


def _fused_bwd_kernel_cls(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          kc_ref, vc_ref,
                          dq_ref, dk_ref, dv_ref, dkc_ref, dvc_ref,
                          dq_acc, dk_acc, dv_acc, dkc_acc, dvc_acc,
                          *, scale, block_q, j_axis=1, i_axis=2):
    """Fused backward with the cls key/value contributions accumulated
    in-kernel (once per q-tile, at the first k-block)."""
    jb = pl.program_id(j_axis)
    ib = pl.program_id(i_axis)
    nj = pl.num_programs(j_axis)
    ni = pl.num_programs(i_axis)

    @pl.when((jb == 0) & (ib == 0))
    def _init_dq():
        dq_acc[:] = jnp.zeros_like(dq_acc)
        dkc_acc[:] = jnp.zeros_like(dkc_acc)
        dvc_acc[:] = jnp.zeros_like(dvc_acc)

    @pl.when(ib == 0)
    def _init_dkv():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    clamped = s > NOMAX_CLAMP
    p = jnp.exp(jnp.minimum(s, NOMAX_CLAMP) - lse_ref[0])

    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0])
    ds = jnp.where(clamped, 0.0, ds).astype(q.dtype)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_tile = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(jb == 0)
    def _cls_contrib():
        # mul+reduce instead of skinny dots (Mosaic can't lower N=1
        # mixed-dtype matmuls; VPU reduces are cheap at d=32)
        qf32 = q.astype(jnp.float32)
        dof32 = do.astype(jnp.float32)
        kcf = kc_ref[0].astype(jnp.float32)                    # [1, d]
        vcf = vc_ref[0].astype(jnp.float32)                    # [1, d]
        s_cls = jnp.sum(qf32 * kcf, axis=1, keepdims=True) * scale
        clamped_c = s_cls > NOMAX_CLAMP
        p_cls = jnp.exp(jnp.minimum(s_cls, NOMAX_CLAMP) - lse_ref[0])
        dp_cls = jnp.sum(dof32 * vcf, axis=1, keepdims=True)   # [bq, 1]
        ds_cls = p_cls * (dp_cls - delta_ref[0])
        ds_cls = jnp.where(clamped_c, 0.0, ds_cls)             # [bq, 1]
        dvc_acc[:] = dvc_acc[:] + jnp.sum(p_cls * dof32, axis=0,
                                          keepdims=True)       # [1, d]
        dkc_acc[:] = dkc_acc[:] + jnp.sum(ds_cls * qf32, axis=0,
                                          keepdims=True) * scale
        dq_acc[pl.ds(ib * block_q, block_q), :] = (
            dq_acc[pl.ds(ib * block_q, block_q), :]
            + ds_cls * kcf * scale)

    dq_acc[pl.ds(ib * block_q, block_q), :] = (
        dq_acc[pl.ds(ib * block_q, block_q), :] + dq_tile)

    @pl.when(ib == ni - 1)
    def _write_dkv():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)

    @pl.when((jb == nj - 1) & (ib == ni - 1))
    def _write_dq():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)
        dkc_ref[0] = dkc_acc[:].astype(dkc_ref.dtype)
        dvc_ref[0] = dvc_acc[:].astype(dvc_ref.dtype)


def _bwd(scale, block_q, block_k, no_max, res, g):
    q, k, v, out, lse = res
    g, g_lse = g  # cotangents of (out, lse)
    bh, n, d = q.shape
    block_q = block_k = _pick_block(n, BWD_BLOCK_TARGET)
    # ds = p * (dp - delta + g_lse): the lse cotangent (d lse / d s_j =
    # p_j) folds into the existing delta term — no kernel change needed.
    delta = (jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                     axis=-1)
             - g_lse.astype(jnp.float32))

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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_use_interpret(),
    )(q, k, v, g, lse, delta)

    return dq[:, :n], dk[:, :n], dv[:, :n]


def _bwd_cls(scale, block, res, g):
    q, k, v, kc, vc, out, lse = res
    g, g_lse = g
    bh, n, d = q.shape
    delta = (jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                     axis=-1)
             - g_lse.astype(jnp.float32))
    bwd_block = _pick_block(n, BWD_BLOCK_TARGET)
    n_pad = _round_up(n, bwd_block)
    pad = n_pad - n
    if pad:
        zp = ((0, 0), (0, pad), (0, 0))
        q, k, v, g = (jnp.pad(a, zp) for a in (q, k, v, g))
        lse = jnp.pad(lse, ((0, 0), (0, pad)))
        delta = jnp.pad(delta, ((0, 0), (0, pad)))
    lse = lse[..., None]
    delta = delta[..., None]
    nt = n_pad // bwd_block

    dq, dk, dv, dkc, dvc = pl.pallas_call(
        functools.partial(_fused_bwd_kernel_cls, scale=scale,
                          block_q=bwd_block),
        grid=(bh, nt, nt),
        in_specs=[
            pl.BlockSpec((1, bwd_block, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bwd_block, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bwd_block, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bwd_block, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bwd_block, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bwd_block, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1, d), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda b, j, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_pad, d), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec((1, bwd_block, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bwd_block, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, 1, d), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda b, j, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
            jax.ShapeDtypeStruct((bh, 1, d), k.dtype),
            jax.ShapeDtypeStruct((bh, 1, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, d), jnp.float32),
            pltpu.VMEM((bwd_block, d), jnp.float32),
            pltpu.VMEM((bwd_block, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_use_interpret(),
    )(q, k, v, g, lse, delta, kc, vc)
    return dq[:, :n], dk[:, :n], dv[:, :n], dkc, dvc


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_bh_cls(q, k, v, kc, vc, scale, block):
    return _fwd_cls(q, k, v, kc, vc, scale, block)


def _flash_bh_cls_fwd(q, k, v, kc, vc, scale, block):
    out, lse = _fwd_cls(q, k, v, kc, vc, scale, block)
    return (out, lse), (q, k, v, kc, vc, out, lse)


_flash_bh_cls.defvjp(_flash_bh_cls_fwd, _bwd_cls)


# ------------------------------------------------- rectangular (nq != nk)
#
# The kernels are length-agnostic (tiles are BlockSpec-indexed and the
# kv-pad corrections key on n_valid); only the square wrappers couple the
# q and kv lengths through one shared n_pad.  These wrappers pad each
# side to its own block multiple — the form sequence parallelism needs
# (each shard's queries attend over the full gathered key/value set).

def _fwd_rect(q, k, v, scale, block_q, block_k, no_max: bool = True,
              kv_valid: int | None = None):
    bh, nq, d = q.shape
    nk = k.shape[1]
    kv_valid = nk if kv_valid is None else kv_valid
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_k)
    if nq_pad - nq:
        q = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, 0)))
    if nk_pad - nk:
        zp = ((0, 0), (0, nk_pad - nk), (0, 0))
        k, v = jnp.pad(k, zp), jnp.pad(v, zp)

    if no_max:
        # kv_valid < nk requires the invalid tail rows to be ZERO (the
        # sequence-parallel wrapper masks them): zero keys contribute
        # exactly e^-SHIFT each, removed by the pad_l correction
        kernel = functools.partial(_fwd_kernel_nomax, scale=scale,
                                   n_valid=kv_valid, block_k=block_k,
                                   n_pad=nk_pad)
        scratch = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ]
    else:
        kernel = functools.partial(_fwd_kernel, scale=scale,
                                   n_valid=kv_valid, block_k=block_k,
                                   n_pad=nk_pad)
        scratch = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ]

    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq_pad // block_q, nk_pad // block_k),
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
            jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nq_pad, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_use_interpret(),
    )(q, k, v)
    return out[:, :nq], lse[:, :nq, 0]


def _bwd_rect_prepare(q, g, out, lse, g_lse, block_q):
    """Query-side (k/v-independent) part of the rectangular backward:
    the delta term and the query-length padding.  Split out so ring
    attention's backward scan (parallel/sequence.py) hoists it once
    instead of recomputing per ring step — delta depends only on
    (g, out, lse), none of which rotate around the ring."""
    nq = q.shape[1]
    delta = (jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                     axis=-1)
             - g_lse.astype(jnp.float32))
    nq_pad = _round_up(nq, block_q)
    if nq_pad - nq:
        zq = ((0, 0), (0, nq_pad - nq), (0, 0))
        q, g = jnp.pad(q, zq), jnp.pad(g, zq)
        lse = jnp.pad(lse, ((0, 0), (0, nq_pad - nq)))
        delta = jnp.pad(delta, ((0, 0), (0, nq_pad - nq)))
    return q, g, lse[..., None], delta[..., None], nq


def _bwd_rect(scale, block_q, block_k, no_max, kv_valid, res, g):
    q, k, v, out, lse = res
    g, g_lse = g
    block_q = _pick_block(q.shape[1], BWD_BLOCK_TARGET)
    block_k = _pick_block(k.shape[1], BWD_BLOCK_TARGET)
    q, g, lse, delta, nq = _bwd_rect_prepare(q, g, out, lse, g_lse, block_q)
    return _bwd_rect_core(scale, block_q, block_k, no_max, kv_valid,
                          q, k, v, g, lse, delta, nq)


def _bwd_rect_core(scale, block_q, block_k, no_max, kv_valid,
                   q, k, v, g, lse, delta, nq):
    """Rectangular fused backward given ALREADY-PREPARED query-side
    operands (from _bwd_rect_prepare); pads/handles only the k/v side."""
    bh, nq_pad, d = q.shape
    nk = k.shape[1]
    nk_pad = _round_up(nk, block_k)
    if nk_pad - nk:
        zk = ((0, 0), (0, nk_pad - nk), (0, 0))
        k, v = jnp.pad(k, zk), jnp.pad(v, zk)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, scale=scale,
                          n_valid=nk if kv_valid is None else kv_valid,
                          block_q=block_q, block_k=block_k, no_max=no_max),
        grid=(bh, nk_pad // block_k, nq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, nq_pad, d), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nq_pad, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_use_interpret(),
    )(q, k, v, g, lse, delta)
    return dq[:, :nq], dk[:, :nk], dv[:, :nk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_bh_rect(q, k, v, scale, block_q, block_k, no_max,
                   kv_valid=None):
    return _fwd_rect(q, k, v, scale, block_q, block_k, no_max, kv_valid)


def _flash_bh_rect_fwd(q, k, v, scale, block_q, block_k, no_max,
                       kv_valid=None):
    out, lse = _fwd_rect(q, k, v, scale, block_q, block_k, no_max, kv_valid)
    return (out, lse), (q, k, v, out, lse)


_flash_bh_rect.defvjp(_flash_bh_rect_fwd, _bwd_rect)


def flash_attention_rect(q, k, v, scale: float | None = None,
                         no_max: bool = True,
                         kv_valid: int | None = None):
    """Cross-attention-shaped flash: q [B, H, Nq, D] against k/v
    [B, H, Nk, D] with Nq != Nk allowed.  Differentiable.  This is the
    core the sequence-parallel wrapper shards (parallel/sequence.py):
    each query shard attends over the full key/value set.

    kv_valid (static): only the first kv_valid keys are attended; the
    tail rows of k AND v must be zero (the caller masks them — the
    zeroing op's VJP then discards their gradient contributions, which
    keeps the backward exact)."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    block_q = _pick_block(nq, FWD_BLOCK_TARGET)
    block_k = _pick_block(nk, FWD_BLOCK_TARGET)
    out, _ = _flash_bh_rect(q.reshape(b * h, nq, d),
                            k.reshape(b * h, nk, d),
                            v.reshape(b * h, nk, d),
                            float(scale), block_q, block_k, bool(no_max),
                            kv_valid)
    return out.reshape(b, h, nq, d)


# ---------------------------------------------------------------- public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_bh(q, k, v, scale, block_q, block_k, no_max):
    """[BH, N, D] core -> (out [BH, N, D], lse [BH, N]).  The lse output
    is differentiable (its cotangent folds into the bwd delta term), which
    lets callers compose exact corrections around the kernel."""
    return _fwd(q, k, v, scale, block_q, block_k, no_max=no_max)


def _flash_bh_fwd(q, k, v, scale, block_q, block_k, no_max):
    out, lse = _fwd(q, k, v, scale, block_q, block_k, no_max=no_max)
    return (out, lse), (q, k, v, out, lse)


_flash_bh.defvjp(_flash_bh_fwd, _bwd)


def _split_cls_attention(q, k, v, scale):
    """Exact attention for a cls-prefixed sequence (n = m*128 + 1): the
    first token's key/value are folded into the kernel epilogue
    (in-VMEM), so the core tiles the remaining n-1 tokens exactly —
    zero padding waste (5121 -> core 5120 instead of 5376; 513 -> 512).
    At the ViT-L decoder shape the kernel is bound by producing the
    padded [n_pad, n_pad] score elements, so the padding is the cost.
    The cls QUERY row is one plain softmax row in XLA (cheap gemv)."""
    b, h, n, d = q.shape
    bh = b * h
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)

    block = _pick_block(n - 1, FWD_BLOCK_TARGET)
    out_tok, _ = _flash_bh_cls(qf[:, 1:], kf[:, 1:], vf[:, 1:],
                               kf[:, :1], vf[:, :1], scale, block)

    # cls query: one full softmax row (cheap gemv pair, plain XLA).
    # preferred_element_type instead of .astype: casting kf/vf would
    # materialize full f32 copies of the key/value arrays.
    s_row = jnp.einsum("bod,bnd->bon", qf[:, :1], kf,
                       preferred_element_type=jnp.float32) * scale
    p_row = jax.nn.softmax(s_row, axis=-1)
    out_cls = jnp.einsum("bon,bnd->bod", p_row.astype(q.dtype), vf,
                         preferred_element_type=jnp.float32).astype(q.dtype)

    out = jnp.concatenate([out_cls, out_tok], axis=1)
    return out.reshape(b, h, n, d)


# ------------------------------------------------------- packed-head layout
#
# [B, N, H*D] interface: heads stay folded into the minor dimension, so
# every XLA-side tensor around the kernel keeps a 512-wide minor dim.
# The [B, H, N, D] layout puts D=32 minor, which the TPU (8,128)/(16,128)
# tiling pads 4x — making the qkv transposes, slices, concats and
# gradient pads around the kernel cost ~2.3ms per ViT-L decoder layer.
# The kernels are unchanged; BlockSpecs index the head's 32-column strip
# of the packed arrays and the grid gains a head dimension.

def _fwd_kernel_packed(q_ref, k_ref, v_ref, kc_ref, vc_ref, o_ref, lse_ref,
                       acc_ref, l_ref, *, scale, n_valid, n_pad, d, G):
    """Packed nomax+cls forward: refs carry G heads side by side in a
    128-lane strip ([block, G*d]); the loop body runs per sub-head on a
    static lane slice.  Pallas requires 128-divisible minor blocks, so a
    lone d=32 head strip cannot be a block on its own."""
    kb = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    for g in range(G):
        sl = slice(g * d, (g + 1) * d)
        q = q_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(jnp.minimum(s, NOMAX_CLAMP) - NOMAX_SHIFT)
        l_ref[:, g:g + 1] = l_ref[:, g:g + 1] + jnp.sum(p, axis=-1,
                                                        keepdims=True)
        acc_ref[:, sl] = acc_ref[:, sl] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kb == nk - 1)
    def _finalize():
        pad_l = math.exp(-NOMAX_SHIFT) * (n_pad - n_valid)
        for g in range(G):
            sl = slice(g * d, (g + 1) * d)
            s_cls = jnp.sum(
                q_ref[0][:, sl].astype(jnp.float32)
                * kc_ref[0][:, sl].astype(jnp.float32),
                axis=1, keepdims=True) * scale
            p_cls = jnp.exp(jnp.minimum(s_cls, NOMAX_CLAMP) - NOMAX_SHIFT)
            l = l_ref[:, g:g + 1] + p_cls - pad_l
            l_safe = jnp.where(l <= 0.0, 1.0, l)
            acc = (acc_ref[:, sl]
                   + p_cls * vc_ref[0][:, sl].astype(jnp.float32))
            o_ref[0, :, sl] = (acc / l_safe).astype(o_ref.dtype)
            lse_ref[0, g] = NOMAX_SHIFT + jnp.log(l_safe)


def _fwd_packed(q, k, v, kc, vc, scale, block, d, extra_pad,
                fused: bool = False):
    """Packed-head forward.  fused=True: q IS the raw [B, N, 3*H*D] Wqkv
    buffer (k/v args ignored) and the kernel reads the q/k/v strips at
    minor block offsets 0 / hg / 2*hg of the same array — the slices
    never materialize in HBM (NOTES_ROUND3.md fused-qkv experiment)."""
    b, n, w = q.shape
    hd = w // 3 if fused else w
    h = hd // d
    G = max(1, 128 // d) if d < 128 else 1
    hg = h // G
    n_pad = _round_up(n, block)
    pad = n_pad - n
    if pad:
        zp = ((0, 0), (0, pad), (0, 0))
        if fused:
            q = k = v = jnp.pad(q, zp)
        else:
            q, k, v = jnp.pad(q, zp), jnp.pad(k, zp), jnp.pad(v, zp)
    elif fused:
        k = v = q
    nt = n_pad // block
    gd = G * d
    koff = hg if fused else 0
    voff = 2 * hg if fused else 0
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_packed, scale=scale,
                          n_valid=n - extra_pad, n_pad=n_pad, d=d, G=G),
        grid=(b, hg, nt, nt),
        in_specs=[
            pl.BlockSpec((1, block, gd), lambda b, h, i, j: (b, i, h)),
            pl.BlockSpec((1, block, gd),
                         lambda b, h, i, j, o=koff: (b, j, o + h)),
            pl.BlockSpec((1, block, gd),
                         lambda b, h, i, j, o=voff: (b, j, o + h)),
            pl.BlockSpec((1, 1, gd), lambda b, h, i, j: (b, 0, h)),
            pl.BlockSpec((1, 1, gd), lambda b, h, i, j: (b, 0, h)),
        ],
        out_specs=[
            pl.BlockSpec((1, block, gd), lambda b, h, i, j: (b, i, h)),
            pl.BlockSpec((1, G, block, 1), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((b, h, n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, gd), jnp.float32),
            pltpu.VMEM((block, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_use_interpret(),
    )(q, k, v, kc, vc)
    return out[:, :n], lse[:, :, :n, 0]


def _bwd_kernel_packed(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       kc_ref, vc_ref,
                       dq_ref, dk_ref, dv_ref, dkc_ref, dvc_ref,
                       dq_acc, dk_acc, dv_acc, dkc_acc, dvc_acc,
                       *, scale, block_q, d, G):
    """Packed fused backward: G heads per 128-lane strip, sub-head loop;
    same math as _fused_bwd_kernel_cls."""
    jb = pl.program_id(2)
    ib = pl.program_id(3)
    nj = pl.num_programs(2)
    ni = pl.num_programs(3)

    @pl.when((jb == 0) & (ib == 0))
    def _init_dq():
        dq_acc[:] = jnp.zeros_like(dq_acc)
        dkc_acc[:] = jnp.zeros_like(dkc_acc)
        dvc_acc[:] = jnp.zeros_like(dvc_acc)

    @pl.when(ib == 0)
    def _init_dkv():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    for g in range(G):
        sl = slice(g * d, (g + 1) * d)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        do = do_ref[0][:, sl]
        lse = lse_ref[0, g]      # [bq, 1]
        delta = delta_ref[0, g]  # [bq, 1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        clamped = s > NOMAX_CLAMP
        p = jnp.exp(jnp.minimum(s, NOMAX_CLAMP) - lse)

        dv_acc[:, sl] = dv_acc[:, sl] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        ds = jnp.where(clamped, 0.0, ds).astype(q.dtype)
        dk_acc[:, sl] = dk_acc[:, sl] + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_tile = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        @pl.when(jb == 0)
        def _cls_contrib():
            qf32 = q.astype(jnp.float32)
            dof32 = do.astype(jnp.float32)
            kcf = kc_ref[0][:, sl].astype(jnp.float32)
            vcf = vc_ref[0][:, sl].astype(jnp.float32)
            s_cls = jnp.sum(qf32 * kcf, axis=1, keepdims=True) * scale
            clamped_c = s_cls > NOMAX_CLAMP
            p_cls = jnp.exp(jnp.minimum(s_cls, NOMAX_CLAMP) - lse)
            dp_cls = jnp.sum(dof32 * vcf, axis=1, keepdims=True)
            ds_cls = p_cls * (dp_cls - delta)
            ds_cls = jnp.where(clamped_c, 0.0, ds_cls)
            dvc_acc[:, sl] = dvc_acc[:, sl] + jnp.sum(
                p_cls * dof32, axis=0, keepdims=True)
            dkc_acc[:, sl] = dkc_acc[:, sl] + jnp.sum(
                ds_cls * qf32, axis=0, keepdims=True) * scale
            dq_acc[pl.ds(ib * block_q, block_q), sl] = (
                dq_acc[pl.ds(ib * block_q, block_q), sl]
                + ds_cls * kcf * scale)

        dq_acc[pl.ds(ib * block_q, block_q), sl] = (
            dq_acc[pl.ds(ib * block_q, block_q), sl] + dq_tile)

    @pl.when(ib == ni - 1)
    def _write_dkv():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)

    @pl.when((jb == nj - 1) & (ib == ni - 1))
    def _write_dq():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)
        dkc_ref[0] = dkc_acc[:].astype(dkc_ref.dtype)
        dvc_ref[0] = dvc_acc[:].astype(dvc_ref.dtype)


def _bwd_packed_impl(scale, d, q, k, v, kc, vc, out, lse, g, g_lse,
                     fused: bool = False):
    """Packed fused backward shared by the sliced and fused-qkv paths;
    fused=True reads q/k/v strips out of the same [B, N, 3*H*D] buffer
    (minor-offset BlockSpecs, mirroring _fwd_packed)."""
    b, n, w = q.shape
    hd = w // 3 if fused else w
    h = hd // d
    G = max(1, 128 // d) if d < 128 else 1
    hg = h // G
    gd = G * d
    # per-head delta: rowsum over each head's strip -> [b, h, n]
    delta = (jnp.einsum(
        "bnhd,bnhd->bhn", g.reshape(b, n, h, d).astype(jnp.float32),
        out.reshape(b, n, h, d).astype(jnp.float32))
        - g_lse.astype(jnp.float32))
    bwd_block = _pick_block(n, BWD_BLOCK_TARGET)
    n_pad = _round_up(n, bwd_block)
    pad = n_pad - n
    if pad:
        zp = ((0, 0), (0, pad), (0, 0))
        if fused:
            q = k = v = jnp.pad(q, zp)
        else:
            q, k, v = (jnp.pad(a, zp) for a in (q, k, v))
        g = jnp.pad(g, zp)
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, pad)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, pad)))
    elif fused:
        k = v = q
    nt = n_pad // bwd_block
    koff = hg if fused else 0
    voff = 2 * hg if fused else 0

    dq, dk, dv, dkc, dvc = pl.pallas_call(
        functools.partial(_bwd_kernel_packed, scale=scale,
                          block_q=bwd_block, d=d, G=G),
        grid=(b, hg, nt, nt),
        in_specs=[
            pl.BlockSpec((1, bwd_block, gd), lambda b, h, j, i: (b, i, h)),
            pl.BlockSpec((1, bwd_block, gd),
                         lambda b, h, j, i, o=koff: (b, j, o + h)),
            pl.BlockSpec((1, bwd_block, gd),
                         lambda b, h, j, i, o=voff: (b, j, o + h)),
            pl.BlockSpec((1, bwd_block, gd), lambda b, h, j, i: (b, i, h)),
            pl.BlockSpec((1, G, bwd_block, 1),
                         lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, G, bwd_block, 1),
                         lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, gd), lambda b, h, j, i: (b, 0, h)),
            pl.BlockSpec((1, 1, gd), lambda b, h, j, i: (b, 0, h)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_pad, gd), lambda b, h, j, i: (b, 0, h)),
            pl.BlockSpec((1, bwd_block, gd), lambda b, h, j, i: (b, j, h)),
            pl.BlockSpec((1, bwd_block, gd), lambda b, h, j, i: (b, j, h)),
            pl.BlockSpec((1, 1, gd), lambda b, h, j, i: (b, 0, h)),
            pl.BlockSpec((1, 1, gd), lambda b, h, j, i: (b, 0, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((b, n_pad, hd), k.dtype),
            jax.ShapeDtypeStruct((b, n_pad, hd), v.dtype),
            jax.ShapeDtypeStruct((b, 1, hd), k.dtype),
            jax.ShapeDtypeStruct((b, 1, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, gd), jnp.float32),
            pltpu.VMEM((bwd_block, gd), jnp.float32),
            pltpu.VMEM((bwd_block, gd), jnp.float32),
            pltpu.VMEM((1, gd), jnp.float32),
            pltpu.VMEM((1, gd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_use_interpret(),
    )(q, k, v, g, lse[..., None], delta[..., None], kc, vc)
    return dq[:, :n], dk[:, :n], dv[:, :n], dkc, dvc


def _bwd_packed(scale, block, d, extra_pad, res, g):
    q, k, v, kc, vc, out, lse = res
    g, g_lse = g
    return _bwd_packed_impl(scale, d, q, k, v, kc, vc, out, lse, g, g_lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_packed(q, k, v, kc, vc, scale, block, d, extra_pad):
    return _fwd_packed(q, k, v, kc, vc, scale, block, d, extra_pad)


def _flash_packed_fwd(q, k, v, kc, vc, scale, block, d, extra_pad):
    out, lse = _fwd_packed(q, k, v, kc, vc, scale, block, d, extra_pad)
    return (out, lse), (q, k, v, kc, vc, out, lse)


_flash_packed.defvjp(_flash_packed_fwd, _bwd_packed)


# ---- fused-qkv variant: the kernels read q/k/v straight out of the
# Wqkv projection buffer [B, N, 3*H*D] via minor-offset BlockSpecs (the
# same array passed three times with shifted minor block indices), so
# the per-layer q/k/v minor-dim slices never materialize in HBM.
# Measured round-3 perf experiment — see NOTES_ROUND3.md.

def _fwd_packed_qkv(qkv, kc, vc, scale, block, d, extra_pad):
    return _fwd_packed(qkv, qkv, qkv, kc, vc, scale, block, d, extra_pad,
                       fused=True)


def _bwd_packed_qkv(scale, block, d, extra_pad, res, g):
    qkv, kc, vc, out, lse = res
    g, g_lse = g
    dq, dk, dv, dkc, dvc = _bwd_packed_impl(
        scale, d, qkv, qkv, qkv, kc, vc, out, lse, g, g_lse, fused=True)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv, dkc, dvc


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_packed_fused(qkv, kc, vc, scale, block, d, extra_pad):
    return _fwd_packed_qkv(qkv, kc, vc, scale, block, d, extra_pad)


def _flash_packed_fused_fwd(qkv, kc, vc, scale, block, d, extra_pad):
    out, lse = _fwd_packed_qkv(qkv, kc, vc, scale, block, d, extra_pad)
    return (out, lse), (qkv, kc, vc, out, lse)


_flash_packed_fused.defvjp(_flash_packed_fused_fwd, _bwd_packed_qkv)


def flash_attention_packed_qkv(qkv, num_heads: int,
                               scale: float | None = None,
                               no_max: bool = True):
    """qkv: [B, N, 3*H*D], the raw fused Wqkv projection -> [B, N, H*D].

    Same math as flash_attention_packed but the kernels consume the
    fused buffer directly (minor-offset BlockSpecs), so the q/k/v
    slices never materialize; the backward concatenates dq/dk/dv once
    into dqkv.  Falls back to the sliced path for shapes the packed
    kernels don't serve."""
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // num_heads
    if scale is None:
        scale = d ** -0.5
    G = max(1, 128 // d) if d < 128 else 1
    ok = (num_heads % G == 0) and (128 % d == 0 or d % 128 == 0)
    if not no_max or not ok:
        q, k, v = (qkv[:, :, i * hd:(i + 1) * hd] for i in range(3))
        return flash_attention_packed(q, k, v, num_heads, scale=scale,
                                      no_max=no_max)

    if n % 128 == 1 and n > 128:
        block = _pick_block(n - 1, FWD_BLOCK_TARGET)
        tok = qkv[:, 1:]
        kc = qkv[:, :1, hd:2 * hd]
        vc = qkv[:, :1, 2 * hd:]
        out_tok, _ = _flash_packed_fused(tok, kc, vc, float(scale), block,
                                         d, 0)
        # cls query row, per head, on reshaped views (plain XLA)
        qc = qkv[:, :1, :hd].reshape(b, 1, num_heads, d)
        kr = qkv[:, :, hd:2 * hd].reshape(b, n, num_heads, d)
        vr = qkv[:, :, 2 * hd:].reshape(b, n, num_heads, d)
        s_row = jnp.einsum("bohd,bnhd->bhon", qc, kr,
                           preferred_element_type=jnp.float32) * scale
        p_row = jax.nn.softmax(s_row, axis=-1)
        out_cls = jnp.einsum("bhon,bnhd->bohd", p_row.astype(qkv.dtype), vr,
                             preferred_element_type=jnp.float32)
        out_cls = out_cls.astype(qkv.dtype).reshape(b, 1, hd)
        return jnp.concatenate([out_cls, out_tok], axis=1)

    block = _pick_block(n, FWD_BLOCK_TARGET)
    zc = jnp.zeros((b, 1, hd), qkv.dtype)
    out, _ = _flash_packed_fused(qkv, zc, zc, float(scale), block, d, 1)
    return out


def flash_attention_packed(q, k, v, num_heads: int,
                           scale: float | None = None, no_max: bool = True):
    """q, k, v: [B, N, H*D] (packed heads, the natural qkv-projection
    layout) -> [B, N, H*D].  Differentiable.

    Skips the [B, H, N, D] transposes entirely and keeps every tensor
    around the kernel at a full-width minor dim.  cls-prefixed sequences
    (n % 128 == 1) fold the first token in-kernel; other lengths run a
    phantom-cls with zero key/value whose exactly-known mass is removed
    by the pad correction, so one kernel serves both."""
    b, n, hd = q.shape
    d = hd // num_heads
    if scale is None:
        scale = d ** -0.5
    G = max(1, 128 // d) if d < 128 else 1
    # packed kernels need 128-divisible lane strips: G = 128/d heads per
    # kernel instance.  Shapes that can't form full strips (tiny test
    # dims, odd head_dim) fall back to the [B,H,N,D] path, as does the
    # exact online-softmax variant.
    ok = (num_heads % G == 0) and (128 % d == 0 or d % 128 == 0)
    if not no_max or not ok:
        def bhnd(x):
            return x.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)

        out = flash_attention(bhnd(q), bhnd(k), bhnd(v), scale=scale,
                              no_max=no_max)
        return out.transpose(0, 2, 1, 3).reshape(b, n, hd)

    if n % 128 == 1 and n > 128:
        block = _pick_block(n - 1, FWD_BLOCK_TARGET)
        out_tok, _ = _flash_packed(q[:, 1:], k[:, 1:], v[:, 1:],
                                   k[:, :1], v[:, :1], float(scale),
                                   block, d, 0)
        # cls query row, per head, on the packed layout (plain XLA)
        qc = q[:, :1].reshape(b, 1, num_heads, d)
        kr = k.reshape(b, n, num_heads, d)
        vr = v.reshape(b, n, num_heads, d)
        s_row = jnp.einsum("bohd,bnhd->bhon", qc, kr,
                           preferred_element_type=jnp.float32) * scale
        p_row = jax.nn.softmax(s_row, axis=-1)
        out_cls = jnp.einsum("bhon,bnhd->bohd", p_row.astype(q.dtype), vr,
                             preferred_element_type=jnp.float32)
        out_cls = out_cls.astype(q.dtype).reshape(b, 1, hd)
        return jnp.concatenate([out_cls, out_tok], axis=1)

    # phantom cls with zero k/v: contributes exactly e^-SHIFT per row to
    # l (removed via extra_pad=1) and nothing anywhere else
    block = _pick_block(n, FWD_BLOCK_TARGET)
    zc = jnp.zeros((b, 1, hd), q.dtype)
    out, _ = _flash_packed(q, k, v, zc, zc, float(scale), block, d, 1)
    return out


def flash_attention(q, k, v, scale: float | None = None,
                    block_q: int | None = None, block_k: int | None = None,
                    no_max: bool = True):
    """q, k, v: [B, H, N, D] -> [B, H, N, D].  Differentiable.

    no_max=True uses the fixed-shift softmax forward (faster; exact as
    long as scaled logits stay below NOMAX_CLAMP=40 — clamped keys'
    weights already saturate, and the backward applies the same clamp so
    fwd/bwd agree).  no_max=False selects the textbook online-softmax
    kernel, exact for any logit range.

    cls-prefixed sequences (n % 128 == 1, the ViT convention) route
    through _split_cls_attention: the first token is folded in outside
    the kernel so the core tiles the remaining n-1 tokens exactly.
    """
    b, h, n, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if (block_q is None and block_k is None and no_max
            and n % 128 == 1 and n > 128):
        return _split_cls_attention(q, k, v, float(scale))
    if block_q is None:
        block_q = _pick_block(n, FWD_BLOCK_TARGET)
    if block_k is None:
        block_k = _pick_block(n, FWD_BLOCK_TARGET)
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    out, _ = _flash_bh(qf, kf, vf, float(scale), block_q, block_k,
                       bool(no_max))
    return out.reshape(b, h, n, d)
