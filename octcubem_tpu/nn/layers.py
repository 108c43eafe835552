"""Transformer building blocks (flax.linen), TPU-first.

Module/param names deliberately mirror the reference's flash-attn block
state-dict keys (blocks.i.{norm1,mixer.Wqkv,mixer.out_proj,norm2,mlp.fc1,
mlp.fc2}) so the PyTorch importer is a mechanical remap
(OCTCube/models_vit_st_flash_attn_nodrop.py:270-302).

Block semantics: mathematically the reference's two-stream flash block
(x, residual) is a standard pre-LN ViT block, EXCEPT that at the end of the
stack the reference feeds the last block's MLP-branch output (without the
final residual add) into the final norm (models_vit_st_flash_attn_nodrop.py
:238-259).  ``Block.__call__`` therefore returns both the full hidden state
and the MLP branch, and encoders pick per their ``parity`` config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import (multi_head_attention,
                             multi_head_attention_packed,  # noqa: F401
                             multi_head_attention_qkv)
from ..ops.quant import int8_matmul

LN_EPS = 1e-6  # partial(nn.LayerNorm, eps=1e-6) everywhere in the reference


class QuantDense(nn.Module):
    """Int8 serving-path Dense: per-channel int8 weights + dynamic
    per-token activation quantization (ops/quant.py).

    Params: {kernel_q: int8 [K, N], scale: fp32 [N], bias} — produced from
    a trained Dense by ``ops.quant.quantize_tree`` (module names unchanged,
    so the converted tree drops straight into a ``quant=True`` model)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", lambda _, s: jnp.zeros(s, jnp.int8),
            (k, self.features))
        scale = self.param(
            "scale", lambda _, s: jnp.ones(s, jnp.float32), (self.features,))
        y = int8_matmul(x.astype(self.dtype), kernel_q, scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    drop: float = 0.0
    quant: bool = False  # int8 serving path (ops/quant.py)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dense = QuantDense if self.quant else nn.Dense
        x = dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)  # torch nn.GELU default (erf)
        if self.drop > 0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        if self.drop > 0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class MHA(nn.Module):
    """Fused-QKV multi-head attention ('mixer' in flash-attn naming)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    quant: bool = False  # int8 projections; attention itself stays bf16

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        dense = QuantDense if self.quant else nn.Dense
        # packed-head path: q/k/v stay [B, N, H*D] end to end — no
        # [B,H,N,D] transposes, whose 32-wide minor dim the TPU layout
        # pads 4x (ops/flash_attention.py packed-layout notes)
        qkv = dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="Wqkv")(x)
        # fused dispatch: the flash path reads q/k/v out of the Wqkv
        # buffer in-kernel (no slice materialization)
        out = multi_head_attention_qkv(qkv, self.num_heads,
                                       impl=self.attn_impl)
        return dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class Block(nn.Module):
    """Pre-LN transformer block; returns (hidden, mlp_branch)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # Recompute the fp32 LayerNorms in the backward instead of saving
    # their fp32 outputs as residuals (jax.checkpoint on just the LN).
    # Math-identical; trades a cheap LN recompute for ~42 MB of fp32
    # HBM residual traffic per decoder-shape LN (NOTES_ROUND3.md
    # attempt 7).  Param names are unchanged (lifted transform).
    remat_norm: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        norm_cls = nn.remat(nn.LayerNorm) if self.remat_norm else nn.LayerNorm
        a = norm_cls(epsilon=LN_EPS, dtype=jnp.float32, name="norm1")(x)
        a = MHA(self.dim, self.num_heads, self.qkv_bias, self.dtype,
                self.attn_impl, self.quant, name="mixer")(a.astype(self.dtype))
        a = DropPath(self.drop_path, name="drop_path1")(a, deterministic)
        x = x + a
        m = norm_cls(epsilon=LN_EPS, dtype=jnp.float32, name="norm2")(x)
        m = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype,
                self.drop, self.quant,
                name="mlp")(m.astype(self.dtype), deterministic)
        m = DropPath(self.drop_path, name="drop_path2")(m, deterministic)
        return x + m, m


class TransformerStack(nn.Module):
    """A stack of Blocks with linearly increasing drop-path and the
    reference's flash-parity final-feature selection.

    parity='flash'    -> final feature is the last block's MLP branch
                         (matches released flash-attn-trained checkpoints)
    parity='standard' -> final feature is the full hidden state
    """

    depth: int
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    parity: str = "flash"
    remat: bool = False
    remat_norm: bool = False
    quant: bool = False
    # Grad-CAM support: insert zero-valued perturbation points after each
    # block (flax perturb); gradients w.r.t. the 'perturbations' collection
    # are exactly dScore/dActivation (see utils/saliency.py)
    capture_cam: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_hidden: bool = False):
        if self.depth > 1:
            dpr = [self.drop_path_rate * i / (self.depth - 1) for i in range(self.depth)]
        else:
            dpr = [0.0]
        hidden = []
        m = x
        block_cls = Block
        if self.remat:
            block_cls = nn.remat(Block, static_argnums=(2,))
        for i in range(self.depth):
            blk = block_cls(
                self.dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                dpr[i], self.drop, self.dtype, self.attn_impl,
                remat_norm=self.remat_norm and not self.remat,
                quant=self.quant, name=f"blocks_{i}"
            )
            x, m = blk(x, deterministic)
            if self.capture_cam:
                # perturb the tensor that actually carries the signal: for
                # flash parity the LAST block's output is its MLP branch
                # (the running hidden x is dead there)
                if i == self.depth - 1 and self.parity == "flash":
                    m = self.perturb(f"cam_{i}", m)
                    self.sow("intermediates", f"cam_act_{i}", m)
                else:
                    x = self.perturb(f"cam_{i}", x)
                    self.sow("intermediates", f"cam_act_{i}", x)
            hidden.append(m if self.parity == "flash" else x)
        if return_hidden:
            return hidden
        return m if self.parity == "flash" else x
