"""Auxiliary COEM towers: CLIP text transformer + tokenizer, and the
reference's experimental encoder options.

Parity targets (retinal-COEM/src/open_clip/):
- transformer.py:13-487 (CLIP text transformer with causal mask,
  LayerNormFp32 semantics) and tokenizer.py — kept by the reference for
  OpenCLIP compatibility although the shipped configs feed images to the
  'text' tower (SURVEY §2.7: "tokenizer unused in practice").
- focalnet.py / vision_transformer4k.py (HIPT) / perceiver.py /
  modified_resnet.py: experimental encoders selectable via config but
  unused by any shipped model config; constructors raise with a pointer
  here so a config that names them fails loudly rather than silently.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.layers import LN_EPS


class SimpleTokenizer:
    """Byte-fallback word tokenizer with the CLIP context convention
    (<start> tokens <end>, pad to context_length).

    The reference ships OpenAI's BPE vocab (bpe_simple_vocab_16e6.txt.gz);
    re-shipping that data is out of scope, so this tokenizer hashes
    lower-cased word pieces into the same 49408-slot space.  Text
    embeddings trained with THIS tokenizer are self-consistent; importing
    OpenAI-text checkpoints would need the original BPE table.
    """

    vocab_size = 49408
    sot = vocab_size - 2
    eot = vocab_size - 1

    def encode(self, text: str) -> list[int]:
        words = re.findall(r"[a-z0-9]+|[^\sa-z0-9]", text.lower())
        return [(hash(w) % (self.vocab_size - 2)) for w in words]

    def __call__(self, texts, context_length: int = 77) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            toks = [self.sot] + self.encode(t)[: context_length - 2] + [self.eot]
            out[i, : len(toks)] = toks
        return out


class TextTransformer(nn.Module):
    """CLIP-style causal text transformer -> pooled projection."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    depth: int = 12
    heads: int = 8
    output_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        b, n = tokens.shape
        x = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                     name="token_embedding")(tokens)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = x + pos[None, :n].astype(x.dtype)
        # causal attention via additive mask on naive attention: reuse the
        # stack with a causal bias by masking post-hoc is incorrect, so a
        # dedicated causal block loop:
        for i in range(self.depth):
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32,
                             name=f"blocks_{i}_ln1")(x)
            qkv = nn.Dense(3 * self.width, dtype=self.dtype,
                           name=f"blocks_{i}_qkv")(h.astype(self.dtype))
            qkv = qkv.reshape(b, n, 3, self.heads, self.width // self.heads)
            q, k, v = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            s = s * (self.width // self.heads) ** -0.5
            causal = jnp.tril(jnp.ones((n, n), bool))
            s = jnp.where(causal[None, None], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, self.width)
            x = x + nn.Dense(self.width, dtype=self.dtype,
                             name=f"blocks_{i}_proj")(ctx)
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32,
                             name=f"blocks_{i}_ln2")(x)
            h = nn.Dense(4 * self.width, dtype=self.dtype,
                         name=f"blocks_{i}_fc")(h.astype(self.dtype))
            h = nn.gelu(h, approximate=False)
            x = x + nn.Dense(self.width, dtype=self.dtype,
                             name=f"blocks_{i}_out")(h)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, name="ln_final")(x)
        # pool at the eot token (highest token id), CLIP convention
        eot_idx = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(
            x, eot_idx[:, None, None].repeat(self.width, -1), axis=1)[:, 0]
        proj = self.param("text_projection", nn.initializers.normal(0.01),
                          (self.width, self.output_dim))
        return pooled @ proj.astype(pooled.dtype)


def _experimental(name: str, ref: str):
    def ctor(*a, **k):
        raise NotImplementedError(
            f"{name} is an experimental aux tower in the reference ({ref}) "
            "that no shipped model config uses; select a ViT/enface tower "
            "instead, or contribute a flax port here.")
    return ctor


focalnet = _experimental("FocalNet", "open_clip/focalnet.py")
hipt_vit4k = _experimental("HIPT ViT-4k", "open_clip/vision_transformer4k.py")
perceiver = _experimental("Perceiver", "open_clip/perceiver.py")
modified_resnet = _experimental("ModifiedResNet", "open_clip/modified_resnet.py")
