"""Einsum tube patchify must bit-match Conv3d(kernel=stride) and the
reference patch flattening order."""

import numpy as np
import torch
import jax.numpy as jnp

from octcubem_tpu.ops.patchify import patchify_3d, unpatchify_3d, tube_embed


def test_tube_embed_matches_conv3d():
    rng = np.random.default_rng(0)
    b, c, t, h, w = 2, 1, 6, 32, 32
    tp, p, d = 3, 16, 24
    x = rng.standard_normal((b, c, t, h, w)).astype(np.float32)
    conv = torch.nn.Conv3d(c, d, kernel_size=(tp, p, p), stride=(tp, p, p))
    ref = conv(torch.tensor(x))  # [b, d, t', h', w']
    ref = ref.flatten(3)
    ref = torch.einsum("ncts->ntsc", ref).detach().numpy()  # [b, t', h'w', d]

    kernel = conv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)  # [tp,p,p,c,d]
    bias = conv.bias.detach().numpy()
    x_cl = x.transpose(0, 2, 3, 4, 1)  # channel-last
    ours = np.asarray(tube_embed(jnp.asarray(x_cl), jnp.asarray(kernel),
                                 jnp.asarray(bias), tp, p))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_patchify_matches_reference_order():
    # reference: x.reshape(N,C,t,u,h,p,w,q) -> einsum nctuhpwq->nthwupqc
    rng = np.random.default_rng(1)
    b, c, t, h, w = 2, 1, 6, 32, 32
    u, p = 3, 16
    x = rng.standard_normal((b, c, t, h, w)).astype(np.float32)
    tt, hh, ww = t // u, h // p, w // p
    ref = x.reshape(b, c, tt, u, hh, p, ww, p)
    ref = np.einsum("nctuhpwq->nthwupqc", ref)
    ref = ref.reshape(b, tt * hh * ww, u * p * p * c)

    x_cl = x.transpose(0, 2, 3, 4, 1)
    ours = np.asarray(patchify_3d(jnp.asarray(x_cl), u, p))
    np.testing.assert_allclose(ours, ref, atol=0, rtol=0)


def test_unpatchify_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, 32, 32, 1)).astype(np.float32)
    tok = patchify_3d(jnp.asarray(x), 3, 16)
    back = unpatchify_3d(tok, 3, 16, (2, 2, 2), 1)
    np.testing.assert_allclose(np.asarray(back), x, atol=0, rtol=0)
