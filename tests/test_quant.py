"""Int8 PTQ serving path (ops/quant.py + nn.QuantDense + quant=True models).

The reference has no quantized inference; this is beyond-reference serving
headroom, so the tests bound the quantization error explicitly instead of
asserting parity with a reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octcubem_tpu.ops import quant
from octcubem_tpu.nn.layers import QuantDense
from octcubem_tpu.models import vit_st


def test_int8_matmul_tracks_float():
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (4, 37, 64), jnp.float32)
    w = jax.random.normal(k2, (64, 96), jnp.float32) * 0.05
    w_q, scale = quant.quantize_weight(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (96,)
    y_ref = x @ w
    y_q = quant.int8_matmul(x, w_q, scale)
    # dynamic per-token int8: worst-case relative error ~1/127 per factor
    rel = np.abs(np.asarray(y_q - y_ref)) / (np.abs(np.asarray(y_ref)) + 1e-3)
    assert np.median(rel) < 0.02 and np.mean(rel) < 0.05


def test_quantize_weight_roundtrip_exact_for_representable():
    # weights already on the int8 grid survive quantization exactly:
    # int entries with per-column abs-max forced to 127 so the computed
    # scale lands exactly on the construction grid
    ints = jax.random.randint(jax.random.key(0), (6, 5), -127, 128)
    ints = ints.at[0, :].set(127)
    w = ints.astype(jnp.float32) * 0.01
    w_q, scale = quant.quantize_weight(w)
    np.testing.assert_allclose(np.asarray(w_q, np.float32) * np.asarray(scale),
                               np.asarray(w), rtol=0, atol=1e-6)


def test_quant_dense_param_layout_matches_converted_tree():
    dense_params = {"kernel": jax.random.normal(jax.random.key(0), (8, 16)),
                    "bias": jnp.zeros((16,))}
    converted = quant.quantize_tree({"fc1": dense_params})["fc1"]
    m = QuantDense(16)
    init = m.init(jax.random.key(1), jnp.ones((2, 8)))["params"]
    assert set(init.keys()) == set(converted.keys())
    for k in init:
        assert init[k].shape == converted[k].shape, k
        assert init[k].dtype == converted[k].dtype, k
    # converted params actually drive the module
    y = m.apply({"params": converted}, jnp.ones((2, 8), jnp.float32))
    y_ref = jnp.ones((2, 8)) @ dense_params["kernel"] + dense_params["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=0.05, atol=0.05)


def test_quantize_tree_only_touches_block_projections():
    tree = {
        "mixer": {"Wqkv": {"kernel": jnp.ones((4, 12)), "bias": jnp.zeros(12)}},
        "head": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros(2)},
        "norm1": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
    }
    out = quant.quantize_tree(tree)
    assert set(out["mixer"]["Wqkv"].keys()) == {"kernel_q", "scale", "bias"}
    assert out["head"]["kernel"].dtype == jnp.float32  # untouched
    assert "scale" in out["norm1"] and out["norm1"]["scale"].dtype == jnp.float32


@pytest.mark.slow  # 2 full classifier builds/head_type; fast int8 cover:
# test_int8_matmul_tracks_float + the quantize_tree conversion tests
@pytest.mark.parametrize("head_type", ["dropout", "aggregate"])
def test_vit_st_int8_logits_track_fp32(head_type):
    """End-to-end: quantized tiny classifier tracks the fp32 logits."""
    kw = dict(num_frames=6, t_patch_size=3, img_size=32, patch_size=16,
              in_chans=1, num_classes=8, embed_dim=64, depth=2, num_heads=4,
              head_type=head_type, global_pool=True, parity="flash",
              attn_impl="naive")
    model = vit_st.VisionTransformerST(**kw)
    qmodel = vit_st.VisionTransformerST(**kw, quant=True)
    x = jax.random.normal(jax.random.key(0), (2, 6, 32, 32, 1), jnp.float32)
    params = model.init(jax.random.key(1), x)
    qparams = {"params": quant.quantize_tree(params["params"])}

    # converted tree structurally matches a quant=True init
    q_init = qmodel.init(jax.random.key(1), x)
    assert (jax.tree_util.tree_structure(q_init)
            == jax.tree_util.tree_structure(qparams))

    logits = np.asarray(model.apply(params, x))
    qlogits = np.asarray(qmodel.apply(qparams, x))
    # bound the PTQ error: same argmax and close logits at random-init scale
    np.testing.assert_allclose(qlogits, logits, rtol=0.15, atol=0.05)
    assert (qlogits.argmax(-1) == logits.argmax(-1)).all()
