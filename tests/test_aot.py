"""AOT serving artifacts (compat/aot.py): jax.export roundtrip.

The artifact bakes trained weights into serialized StableHLO; loading
needs no model code.  Beyond-reference serving headroom (the reference
re-materializes the full model class from a torch checkpoint,
inference_utils.py:30-39).
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octcubem_tpu.compat.aot import (MAGIC, export_serving_artifact,
                                     load_serving_artifact)


def _tiny_model_and_params():
    from octcubem_tpu.models.vit_st import VisionTransformerST

    model = VisionTransformerST(
        num_frames=6, t_patch_size=3, img_size=32, in_chans=1,
        num_classes=4, embed_dim=32, depth=2, num_heads=2,
        head_type="dropout", global_pool=True, attn_impl="naive")
    x = jax.random.normal(jax.random.key(0), (2, 6, 32, 32, 1), jnp.float32)
    params = model.init(jax.random.key(1), x)
    return model, params, x


@pytest.mark.slow  # ViT-L-scale build/forward; full-suite only
def test_aot_roundtrip_matches_live_model(tmp_path):
    model, params, x = _tiny_model_and_params()

    def fwd(x):
        return model.apply(params, x, return_embeddings=True)

    path = str(tmp_path / "m.octaot")
    out = export_serving_artifact(fwd, (x,), path,
                                  meta={"nb_classes": 4, "quant": "none"})
    assert out == path

    fn, meta = load_serving_artifact(path)
    assert meta["nb_classes"] == 4
    assert meta["in_shapes"][0] == [2, 6, 32, 32, 1]
    assert jax.default_backend() in meta["platforms"]

    ref_logits, ref_emb = jax.jit(fwd)(x)
    got_logits, got_emb = fn(x)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(ref_logits), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_emb),
                               np.asarray(ref_emb), rtol=0, atol=1e-6)


def test_aot_rejects_bad_magic(tmp_path):
    p = tmp_path / "junk.octaot"
    p.write_bytes(b"definitely not an artifact")
    with pytest.raises(ValueError, match="not an OCTPU-AOT1 artifact"):
        load_serving_artifact(str(p))


def test_aot_rejects_wrong_platform(tmp_path):
    # handcrafted container claiming a platform this host doesn't run
    p = tmp_path / "tpuonly.octaot"
    header = json.dumps({"platforms": ["tpu"], "in_shapes": [[1]],
                         "in_dtypes": ["float32"]}).encode()
    p.write_bytes(MAGIC + header + b"\n" + b"\x00")
    with pytest.raises(ValueError, match="lowered for"):
        load_serving_artifact(str(p))
