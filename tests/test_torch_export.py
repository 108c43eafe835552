"""Exporter roundtrip: flax params -> reference torch state dict -> flax.

import(export(p)) must be exact (same arrays, no missing/unexpected keys)
for the classifier and the joint MAE — the guarantee that checkpoints
trained here load in the reference ecosystem and can come back.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from octcubem_tpu.compat.torch_export import (export_state_dict,
                                              save_torch_checkpoint,
                                              to_retfound_layout)
from octcubem_tpu.compat.torch_import import (import_state_dict,
                                              load_torch_checkpoint)
from octcubem_tpu.models import mae3d, vit_st


def _tiny_vit():
    m = vit_st.VisionTransformerST(
        num_frames=6, t_patch_size=3, img_size=32, patch_size=16,
        in_chans=1, embed_dim=32, depth=2, num_heads=2, num_classes=4,
        attn_impl="naive")
    p = m.init(jax.random.key(0), jnp.zeros((1, 6, 32, 32, 1)))
    return m, p


def _tiny_mae():
    m = mae3d.MaskedAutoencoderViT3D(
        input_size=32, patch_size=16, in_chans=1, embed_dim=32, depth=1,
        num_heads=2, decoder_embed_dim=32, decoder_depth=1,
        decoder_num_heads=2, num_frames=6, t_patch_size=3, pred_t_dim=6,
        attn_impl="naive")
    p = m.init({"params": jax.random.key(0), "masking": jax.random.key(1)},
               jnp.zeros((1, 6, 32, 32, 1)), mask_ratio=0.75)
    return m, p


def _assert_roundtrip(params, sd):
    p2, rep = import_state_dict(params, sd, strict=True)
    assert rep["missing"] == [], rep["missing"]
    assert rep["unexpected"] == [], rep["unexpected"]
    flat2 = {tuple(str(k) for k in p): v
             for p, v in jax.tree_util.tree_leaves_with_path(p2)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        kp = tuple(str(k) for k in path)
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat2[kp]),
                                      err_msg=str(kp))


@pytest.mark.parametrize("build", [_tiny_vit, _tiny_mae])
def test_export_import_roundtrip_exact(build):
    _, params = build()
    sd = export_state_dict(params)
    # the exported keys look like reference flash checkpoints
    assert any(k.startswith("blocks.0.mixer.Wqkv.") for k in sd)
    assert "patch_embed.proj.weight" in sd
    # conv layout really is torch [D, C, t, p, p]
    assert sd["patch_embed.proj.weight"].shape == (32, 1, 3, 16, 16)
    _assert_roundtrip(params, sd)


def test_export_retfound_layout_roundtrips_via_importer():
    """The retfound-style export (attn.qkv) comes back through the same
    importer path the reference RETFound loader exercises."""
    _, params = _tiny_vit()
    sd = to_retfound_layout(export_state_dict(params))
    assert any(".attn.qkv." in k for k in sd)
    assert not any(".mixer." in k for k in sd)
    _assert_roundtrip(params, sd)


def test_save_torch_checkpoint_loads_back(tmp_path):
    torch = pytest.importorskip("torch")  # noqa: F841
    _, params = _tiny_vit()
    sd = export_state_dict(params)
    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(path, sd, extra={"epoch": 3})
    back = load_torch_checkpoint(path)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])
