import numpy as np
import jax
import jax.numpy as jnp

from octcubem_tpu.models.aux_towers import SimpleTokenizer, TextTransformer
from octcubem_tpu.core import checkpoint as ckpt


def test_tokenizer():
    tok = SimpleTokenizer()
    out = tok(["macular degeneration", "diabetic retinopathy stage 2"])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.sot
    assert (out == tok.eot).sum() == 2
    # deterministic
    np.testing.assert_array_equal(out, tok(
        ["macular degeneration", "diabetic retinopathy stage 2"]))


def test_bpe_tokenizer_matches_clip():
    """Real BPE against known OpenAI-CLIP tokenizations; skipped when the
    merge table is not locatable at runtime (it is loaded, not vendored)."""
    import pytest

    from octcubem_tpu.models.aux_towers import BPETokenizer, find_bpe_vocab

    if find_bpe_vocab() is None:
        pytest.skip("bpe_simple_vocab_16e6.txt.gz not available")
    tok = BPETokenizer()
    assert tok.vocab_size == 49408
    assert tok.sot == 49406 and tok.eot == 49407
    out = tok(["a photo of a cat"])
    np.testing.assert_array_equal(
        out[0, :7], [49406, 320, 1125, 539, 320, 2368, 49407])
    assert (out[0, 7:] == 0).all()
    # byte-level fallback handles arbitrary text; decode round-trips
    ids = tok.encode("diabetic macular edema, OS; 2 visits")
    assert tok.decode(ids) == "diabetic macular edema , os ; 2 visits"


def test_get_tokenizer_fallback(monkeypatch):
    from octcubem_tpu.models import aux_towers

    monkeypatch.setattr(aux_towers, "find_bpe_vocab", lambda: None)
    tok = aux_towers.get_tokenizer()
    assert isinstance(tok, aux_towers.SimpleTokenizer)


def test_text_transformer():
    tok = SimpleTokenizer()
    tokens = jnp.asarray(tok(["oct volume of left eye", "fundus image"]))
    m = TextTransformer(width=32, depth=2, heads=2, output_dim=16)
    params = m.init(jax.random.key(0), tokens)
    out = m.apply(params, tokens)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_experimental_towers_raise():
    from octcubem_tpu.models import aux_towers
    import pytest
    with pytest.raises(NotImplementedError):
        aux_towers.perceiver()
    with pytest.raises(NotImplementedError):
        aux_towers.focalnet()


def test_modified_resnet_forward():
    """CLIP ModifiedResNet (modified_resnet.py:95-181): stem + 4 stages +
    attention pool; total downsample 32x; eval uses running BN stats,
    train mode computes batch stats (mutable batch_stats)."""
    from octcubem_tpu.models.aux_towers import ModifiedResNet

    m = ModifiedResNet(layers=(1, 1, 1, 1), output_dim=16, heads=2,
                       image_size=64, width=8)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                    jnp.float32)
    variables = m.init(jax.random.key(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 16) and np.isfinite(np.asarray(out)).all()
    out_t, updates = m.apply(variables, x, deterministic=False,
                             mutable=["batch_stats"])
    assert out_t.shape == (2, 16)
    assert "batch_stats" in updates


def test_hipt_vit4k_forward():
    """HIPT region ViT (vision_transformer4k.py:161-259): consumes a
    feature map, phi projection, cls pooling; pos embeds interpolate for
    off-grid inputs."""
    from octcubem_tpu.models.aux_towers import VisionTransformer4K

    m = VisionTransformer4K(input_embed_dim=24, output_embed_dim=16,
                            depth=2, num_heads=2, img_size=64)
    feat = jnp.asarray(np.random.default_rng(1).random((2, 4, 4, 24)),
                       jnp.float32)
    params = m.init(jax.random.key(0), feat)
    out = m.apply(params, feat)
    assert out.shape == (2, 16)
    # off-grid feature map exercises pos-embed interpolation
    feat2 = jnp.asarray(np.random.default_rng(2).random((2, 6, 6, 24)),
                        jnp.float32)
    out2 = m.apply(params, feat2)
    assert out2.shape == (2, 16) and np.isfinite(np.asarray(out2)).all()


def test_coem_factory_selects_aux_towers():
    """A COEM config whose vision_cfg.layers is a list builds a
    ModifiedResNet visual tower; 'hipt': true builds the ViT-4k
    (model.py:139-419 dispatch)."""
    from octcubem_tpu.models import coem

    m = coem.COEP2Tower(
        embed_dim=16,
        vision_cfg=dict(layers=[1, 1, 1, 1], heads=2, image_size=64,
                        width=8),
        enface_cfg=dict(img_size=32, patch_size=16, in_chans=3,
                        embed_dim=32, depth=1, num_heads=2,
                        parity="standard"),
        attn_impl="naive")
    img = jnp.ones((2, 64, 64, 3))
    enf = jnp.ones((2, 32, 32, 3))
    variables = m.init(jax.random.key(0), img, enf)
    fi, fe, scale = m.apply(variables, img, enf)
    assert fi.shape == (2, 16) and fe.shape == (2, 16)

    m2 = coem.COEP2Tower(
        embed_dim=16,
        vision_cfg=dict(hipt=True, input_embed_dim=24, output_embed_dim=16,
                        depth=1, num_heads=2, img_size=64),
        enface_cfg=dict(img_size=32, patch_size=16, in_chans=3,
                        embed_dim=32, depth=1, num_heads=2,
                        parity="standard"),
        attn_impl="naive")
    feat = jnp.ones((2, 4, 4, 24))
    variables2 = m2.init(jax.random.key(0), feat, enf)
    fi2, fe2, _ = m2.apply(variables2, feat, enf)
    assert fi2.shape == (2, 16) and fe2.shape == (2, 16)


def test_checkpoint_save_restore_delete(tmp_path):
    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(3)}
    d = str(tmp_path / "ck")
    for step in (0, 1, 2):
        ckpt.save_checkpoint(d, step, state, {"epoch": step})
    assert ckpt.latest_step(d) == 2
    restored, extra, step = ckpt.restore_checkpoint(d, state)
    assert step == 2 and extra["epoch"] == 2
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(state["w"]))
    deleted = ckpt.delete_recent_checkpoints(d, 2)
    assert deleted == [2, 1]
    assert ckpt.latest_step(d) == 0
