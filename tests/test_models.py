import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octcubem_tpu.models import vit_st, mae3d


def _tiny_vit(**kw):
    defaults = dict(
        num_frames=6, t_patch_size=3, img_size=32, patch_size=16,
        in_chans=1, num_classes=4, embed_dim=32, depth=2, num_heads=2,
        attn_impl="naive",
    )
    defaults.update(kw)
    return vit_st.VisionTransformerST(**defaults)


def test_vit_st_forward_shapes():
    m = _tiny_vit()
    x = jnp.ones((2, 6, 32, 32, 1))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_st_dropout_head_and_embeddings():
    m = _tiny_vit(head_type="dropout")
    x = jnp.ones((1, 6, 32, 32, 1))
    params = m.init(jax.random.key(0), x)
    out, emb = m.apply(params, x, return_embeddings=True)
    assert out.shape == (1, 4) and emb.shape == (1, 32)


def test_vit_st_flash_vs_standard_parity_differ():
    """flash parity (no final residual add) must differ from standard."""
    x = jax.random.normal(jax.random.key(1), (1, 6, 32, 32, 1))
    mf = _tiny_vit(parity="flash")
    ms = _tiny_vit(parity="standard")
    params = mf.init(jax.random.key(0), x)
    of = mf.apply(params, x)
    os_ = ms.apply(params, x)
    assert not np.allclose(np.asarray(of), np.asarray(os_))


def test_vit_st_hidden_states():
    m = _tiny_vit()
    x = jnp.ones((1, 6, 32, 32, 1))
    params = m.init(jax.random.key(0), x)
    hidden = m.apply(params, x, return_hidden=True)
    assert len(hidden) == 2
    assert hidden[0].shape == (1, 1 + 2 * 4, 32)


def _tiny_mae(**kw):
    defaults = dict(
        input_size=32, high_res_input_size=64, patch_size=16, in_chans=1,
        embed_dim=32, depth=2, num_heads=2, decoder_embed_dim=16,
        decoder_depth=1, decoder_num_heads=2, num_frames=6, t_patch_size=3,
        pred_t_dim=6, attn_impl="naive",
    )
    defaults.update(kw)
    return mae3d.MaskedAutoencoderViT3D(**defaults)


@pytest.mark.slow
def test_mae3d_forward_3d():
    m = _tiny_mae()
    x = jax.random.normal(jax.random.key(0), (2, 6, 32, 32, 1))
    params = m.init({"params": jax.random.key(1), "masking": jax.random.key(2)},
                    x, mask_ratio=0.75)
    loss, frame_losses, pred, mask = m.apply(
        params, x, mask_ratio=0.75, rngs={"masking": jax.random.key(3)})
    assert np.isfinite(float(loss))
    assert frame_losses.shape == (2, 2)  # t_grid = 2
    # L = 2*2*2 = 8 tokens, mask 0.75 -> 6 masked
    assert pred.shape == (2, 8, 3 * 16 * 16 * 1)
    assert np.asarray(mask).sum() == 2 * 6


@pytest.mark.slow  # joint-dispatch fast cover: test_vit_st_joint_high_res_dispatch
def test_mae3d_forward_2d_highres():
    """2D co-training input: T = t_patch_size replicated frames, high-res."""
    m = _tiny_mae()
    x3 = jax.random.normal(jax.random.key(0), (2, 6, 32, 32, 1))
    params = m.init({"params": jax.random.key(1), "masking": jax.random.key(2)},
                    x3, mask_ratio=0.75)
    x2 = jax.random.normal(jax.random.key(4), (2, 3, 64, 64, 1))
    loss, frame_losses, pred, mask = m.apply(
        params, x2, mask_ratio=0.75, rngs={"masking": jax.random.key(5)})
    assert np.isfinite(float(loss))
    assert frame_losses.shape == (2, 1)
    assert pred.shape == (2, 16, 3 * 16 * 16 * 1)  # 4x4 grid, t'=1


@pytest.mark.slow  # mask_ratio=0 traces the full-length decode (~18s CPU)
def test_mae3d_eval_no_masking():
    m = _tiny_mae()
    x = jax.random.normal(jax.random.key(0), (1, 6, 32, 32, 1))
    params = m.init({"params": jax.random.key(1), "masking": jax.random.key(2)},
                    x, mask_ratio=0.75)
    loss, _, pred, mask = m.apply(params, x, mask_ratio=0.0)
    assert np.asarray(mask).sum() == 0
    assert np.isfinite(np.asarray(pred)).all()


def test_mae3d_premask():
    m = _tiny_mae()
    x = jax.random.normal(jax.random.key(0), (1, 6, 32, 32, 1))
    params = m.init({"params": jax.random.key(1), "masking": jax.random.key(2)},
                    x, mask_ratio=0.75)
    pre = np.zeros((1, 8), dtype=np.float32)
    pre[:, :2] = 1.0
    _, _, _, mask = m.apply(params, x, mask_ratio=0.75,
                            pre_mask=jnp.asarray(pre),
                            rngs={"masking": jax.random.key(6)})
    assert (np.asarray(mask)[:, :2] == 1).all()


@pytest.mark.slow
def test_mae3d_remat_norm_equivalence():
    """remat_norm recomputes LNs in the bwd; fwd identical, grads ~exact.

    Param names are unchanged by the lifted transform, so the same param
    tree drives both variants (measured perf-neutral on v5e,
    NOTES_ROUND3.md attempt 7 — kept as an opt-in HBM-residual knob).
    Grads match to recompute-reassociation noise (~1e-9 fp32).
    """
    m0 = _tiny_mae()
    m1 = _tiny_mae(remat_norm=True)
    x = jax.random.normal(jax.random.key(0), (1, 6, 32, 32, 1))
    params = m0.init({"params": jax.random.key(1), "masking": jax.random.key(2)},
                     x, mask_ratio=0.75)

    def loss_fn(m):
        def f(p):
            loss, _, _, _ = m.apply(p, x, mask_ratio=0.75,
                                    rngs={"masking": jax.random.key(3)})
            return loss
        return f

    l0, g0 = jax.value_and_grad(loss_fn(m0))(params)
    l1, g1 = jax.value_and_grad(loss_fn(m1))(params)
    assert np.asarray(l0) == np.asarray(l1)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7), g0, g1)


@pytest.mark.slow  # ViT-L-scale build/forward; full-suite only
def test_mae3d_decoder_head_repartition_same_params():
    """The TPU-native decoder preset (vitl_mae_tpu_native:
    decoder_num_heads=4 -> head_dim 128 instead of the reference's 16 ->
    head_dim 32, models_mae_joint_res_flash_attn.py:807-843) only
    re-partitions the attention projections: the param TREE (paths and
    shapes) is identical across head counts, so checkpoints stay
    layout-compatible, and FLOPs are unchanged.  Both geometries train
    (finite loss + grads)."""
    m_par = _tiny_mae(decoder_num_heads=4)   # "parity-like" count
    m_nat = _tiny_mae(decoder_num_heads=1)   # repartitioned (hd 16)
    x = jax.random.normal(jax.random.key(0), (2, 6, 32, 32, 1))
    rngs = {"params": jax.random.key(1), "masking": jax.random.key(2)}
    p_par = m_par.init(rngs, x, mask_ratio=0.75)
    p_nat = m_nat.init(rngs, x, mask_ratio=0.75)
    flat_par = jax.tree_util.tree_flatten_with_path(p_par)[0]
    flat_nat = jax.tree_util.tree_flatten_with_path(p_nat)[0]
    assert [(k, v.shape) for k, v in flat_par] == \
           [(k, v.shape) for k, v in flat_nat]

    for m, p in ((m_par, p_par), (m_nat, p_nat)):
        def loss_fn(p_):
            out = m.apply(p_, x, mask_ratio=0.75,
                          rngs={"masking": jax.random.key(3)})
            return out[0]
        loss, grads = jax.value_and_grad(loss_fn)(p)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree.leaves(grads))


@pytest.mark.slow  # ViT-L-scale build/forward; full-suite only
def test_vit_st_head_repartition_same_params():
    """Encoder head re-partitioning (e.g. vit_large_patch16 at
    num_heads=8 -> head_dim 128 instead of the reference's 16 -> 64,
    models_vit_st_flash_attn_nodrop.py:353-404): the attention params
    are [D, 3D]/[D, D] regardless of head count, so the param tree is
    identical and checkpoints stay layout-compatible; FLOPs unchanged.
    Both head counts forward + backprop finitely."""
    m16 = _tiny_vit(num_heads=2)   # head_dim 16 ("parity-like")
    m8 = _tiny_vit(num_heads=1)    # re-partitioned (head_dim 32)
    x = jax.random.normal(jax.random.key(0), (2, 6, 32, 32, 1))
    p16 = m16.init(jax.random.key(1), x)
    p8 = m8.init(jax.random.key(1), x)
    flat16 = jax.tree_util.tree_flatten_with_path(p16)[0]
    flat8 = jax.tree_util.tree_flatten_with_path(p8)[0]
    assert [(k, v.shape) for k, v in flat16] == \
           [(k, v.shape) for k, v in flat8]
    for m, p in ((m16, p16), (m8, p8)):
        loss, grads = jax.value_and_grad(
            lambda p_: (m.apply(p_, x) ** 2).sum())(p)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree.leaves(grads))


def test_factory_num_heads_override():
    """The constructor-registry factories accept a num_heads override
    (TPU-native head re-partitioning) without disturbing their defaults."""
    kw = dict(num_frames=6, t_patch_size=3)
    assert vit_st.vit_large_patch16(**kw).num_heads == 16
    assert vit_st.vit_large_patch16(num_heads=8, **kw).num_heads == 8
    assert mae3d.mae_vit_large_patch16(**kw).num_heads == 16
    assert mae3d.mae_vit_large_patch16(
        num_heads=8, decoder_num_heads=4, **kw).num_heads == 8


def test_config_num_heads_reaches_models():
    """The encoder head-partitioning knob flows from the typed configs
    into the constructed models (pretrain cfg.num_heads; finetune
    build_model) — a TPU-native-pretrained encoder (num_heads=8) must be
    reconstructable by every downstream consumer."""
    import jax.numpy as jnp

    from octcubem_tpu.core.config import (FinetuneConfig, MAEPretrainConfig,
                                          load_config)
    from octcubem_tpu.cli.finetune import build_model

    cfg = load_config(MAEPretrainConfig, "vitl_joint_pretrain", num_heads=8)
    assert cfg.num_heads == 8 and cfg.decoder_num_heads == 16

    fcfg = load_config(FinetuneConfig, "octcube_multitask", num_heads=8)
    model = build_model(fcfg, jnp.float32)
    assert model.num_heads == 8
    # default stays reference parity
    assert build_model(load_config(FinetuneConfig, "octcube_multitask"),
                       jnp.float32).num_heads == 16


def test_vith_preset_resolves_model_dispatch():
    """cli.pretrain dispatches the MAE constructor on cfg.model
    (mirroring the reference's models_mae.__dict__[args.model] dispatch,
    Pre-training/main_pretrain_oph_joint_2d512_flash_attn.py:383); the
    vith_mae_tpu_native preset resolves mae_vit_huge_patch14
    (models_mae_joint_res_flash_attn.py:829-843, shipped but never
    trained upstream) with head_dim-128 partitionings on both sides."""
    from octcubem_tpu.core.config import MAEPretrainConfig, load_config

    cfg = load_config(MAEPretrainConfig, "vith_mae_tpu_native")
    ctor = getattr(mae3d, cfg.model)
    m = ctor(num_frames=6, t_patch_size=3, pred_t_dim=6,
             input_size=cfg.input_size,
             high_res_input_size=cfg.high_res_input_size,
             num_heads=cfg.num_heads,
             decoder_num_heads=cfg.decoder_num_heads)
    assert m.embed_dim == 1280 and m.depth == 32 and m.patch_size == 14
    assert m.embed_dim // m.num_heads == 128            # enc packed path
    assert m.decoder_embed_dim // m.decoder_num_heads == 128
    # both resolutions tile the 14-pixel patch grid
    assert cfg.input_size % 14 == 0 and cfg.high_res_input_size % 14 == 0


def test_pretrain_cli_rejects_unknown_model(tmp_path):
    """An unknown cfg.model fails loudly at dispatch, before any data or
    compile work."""
    import dataclasses
    import json

    from octcubem_tpu.cli import pretrain
    from octcubem_tpu.core.config import (MAEPretrainConfig, load_config,
                                          to_json)

    cfg = dataclasses.replace(
        load_config(MAEPretrainConfig, "vitl_joint_pretrain"),
        model="mae_vit_nonexistent")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(to_json(cfg))
    with pytest.raises(SystemExit, match="unknown MAE model"):
        pretrain.main(["--preset", str(cfg_path), "--tiny", "--synthetic",
                       "--output_dir", str(tmp_path / "out")])
