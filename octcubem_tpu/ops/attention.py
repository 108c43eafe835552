"""Multi-head attention ops: XLA reference path + Pallas flash dispatch.

The reference's hot kernel is flash-attn 2.5.2 CUDA (SURVEY.md §2.9,
flash_attn.models.vit.create_block); here the equivalent is a Pallas
online-softmax kernel (ops/flash_attention.py).  The naive path below is
the bit-parity / CPU-test reference: plain softmax(QK^T)V with fp32
softmax, identical math to OCTCube/util/video_vit.py:115-141.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def naive_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float | None = None) -> jnp.ndarray:
    """q, k, v: [B, H, N, D] -> [B, H, N, D]. fp32 softmax accumulation."""
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def multi_head_attention(q, k, v, scale=None, impl: str = "auto"):
    """Dispatch between the Pallas flash kernel and the naive path.

    impl: 'flash' | 'naive' | 'auto' (flash on TPU, naive elsewhere).
    """
    if impl == "auto":
        platform = jax.local_devices()[0].platform
        impl = "flash" if platform in ("tpu", "axon") else "naive"
    if impl == "flash":
        from .flash_attention import flash_attention
        return flash_attention(q, k, v, scale=scale)
    return naive_attention(q, k, v, scale=scale)


def multi_head_attention_packed(q, k, v, num_heads: int, scale=None,
                                impl: str = "auto"):
    """Packed-head dispatch: q/k/v [B, N, H*D] -> [B, N, H*D].

    The flash path consumes the packed layout directly (no [B,H,N,D]
    transposes, full-width minor dims around the kernel — see
    flash_attention_packed); the naive path unpacks for the reference
    einsum math."""
    b, n, hd = q.shape
    d = hd // num_heads
    if impl == "auto":
        platform = jax.local_devices()[0].platform
        impl = "flash" if platform in ("tpu", "axon") else "naive"
    if impl == "flash":
        from .flash_attention import flash_attention_packed
        return flash_attention_packed(q, k, v, num_heads, scale=scale)

    def bhnd(x):
        return x.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)

    if impl == "flash_sp":
        # sequence-parallel: queries sharded over the context's sp axis,
        # rectangular flash against the all-gathered k/v
        # (parallel/sequence.py).  Sequences not divisible by the sp
        # degree (e.g. 5121 = 5120 tokens + cls) are zero-padded here and
        # masked via kv_valid; the pad query rows are sliced off.
        from ..parallel.sequence import (current_sp,
                                         sequence_parallel_attention)

        mesh, axis, batch_axis = current_sp()
        n_sp = mesh.shape[axis]
        qh, kh, vh = bhnd(q), bhnd(k), bhnd(v)
        pad = -n % n_sp
        if pad:
            zp = ((0, 0), (0, 0), (0, pad), (0, 0))
            qh, kh, vh = (jnp.pad(x, zp) for x in (qh, kh, vh))
        out = sequence_parallel_attention(
            qh, kh, vh, mesh, axis, scale=scale,
            n_valid=n if pad else None, batch_axis=batch_axis)
        if pad:
            out = out[:, :, :n]
        return out.transpose(0, 2, 1, 3).reshape(b, n, hd)

    if impl == "flash_tp":
        # head-parallel: the packed minor dim sharded by head groups over
        # the context's tp axis; no collectives inside attention
        # (parallel/tensor.py)
        from ..parallel.tensor import current_tp, head_parallel_attention

        mesh, axis = current_tp()
        return head_parallel_attention(q, k, v, num_heads, mesh, axis,
                                       scale=scale)

    out = naive_attention(bhnd(q), bhnd(k), bhnd(v), scale=scale)
    return out.transpose(0, 2, 1, 3).reshape(b, n, hd)


def multi_head_attention_qkv(qkv, num_heads: int, scale=None,
                             impl: str = "auto"):
    """Fused-projection dispatch: qkv [B, N, 3*H*D] straight from Wqkv.

    The flash path consumes the fused buffer without materializing the
    q/k/v minor-dim slices (flash_attention_packed_qkv — measured HBM
    saving, NOTES_ROUND3.md); other impls slice and delegate."""
    if impl == "auto":
        platform = jax.local_devices()[0].platform
        impl = "flash" if platform in ("tpu", "axon") else "naive"
    if impl == "flash":
        from .flash_attention import flash_attention_packed_qkv
        return flash_attention_packed_qkv(qkv, num_heads, scale=scale)
    hd = qkv.shape[-1] // 3
    q, k, v = (qkv[:, :, i * hd:(i + 1) * hd] for i in range(3))
    return multi_head_attention_packed(q, k, v, num_heads, scale=scale,
                                       impl=impl)
