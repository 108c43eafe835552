import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from octcubem_tpu.models import coem
from octcubem_tpu.train import clip_engine
import pytest

V_CFG = dict(num_frames=6, t_patch_size=3, img_size=32, patch_size=16,
             in_chans=1, embed_dim=32, depth=2, num_heads=2)
E_CFG = dict(img_size=32, patch_size=16, in_chans=3, embed_dim=32, depth=2,
             num_heads=2)


def _inputs(b=4):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((b, 6, 32, 32, 1)), jnp.float32)
    enf = jnp.asarray(rng.standard_normal((b, 32, 32, 3)), jnp.float32)
    return img, enf


@pytest.mark.slow
def test_two_tower_forward():
    m = coem.COEP2Tower(embed_dim=16, vision_cfg=V_CFG,
                        enface_cfg=E_CFG, attn_impl="naive")
    img, enf = _inputs()
    params = m.init(jax.random.key(0), img, enf)
    fi, fe, scale = m.apply(params, img, enf)
    assert fi.shape == (4, 16) and fe.shape == (4, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(fi), axis=-1), 1.0,
                               rtol=1e-5)
    np.testing.assert_allclose(float(scale), 1 / 0.07, rtol=1e-5)


@pytest.mark.slow  # single-modality ablation traces both tower graphs
# (~11s); fast 2-tower cover: test_clip_train_step_runs + dispatch tests
def test_two_tower_single_modality():
    m = coem.COEP2Tower(embed_dim=16, vision_cfg=V_CFG,
                        enface_cfg=E_CFG, attn_impl="naive")
    img, enf = _inputs()
    params = m.init(jax.random.key(0), img, enf)
    fi, fe, _ = m.apply(params, img, enf, single_modality="image")
    assert fe is None and fi is not None


def test_three_tower_modalities_differ():
    m = coem.COEP3Tower(embed_dim=16, vision_cfg=V_CFG,
                        enface_cfg={**E_CFG, "num_mod_head": 2},
                        attn_impl="naive")
    img, enf = _inputs()
    params = m.init(jax.random.key(0), img, enf, enf)
    fi, f1, f2, s0, s1, s2 = m.apply(params, img, enf, enf)
    # same enface input through different mod heads -> different features
    assert not np.allclose(np.asarray(f1), np.asarray(f2))


def test_clip_loss_matches_torch():
    rng = np.random.default_rng(1)
    fi = rng.standard_normal((6, 8)).astype(np.float32)
    fe = rng.standard_normal((6, 8)).astype(np.float32)
    fi /= np.linalg.norm(fi, axis=-1, keepdims=True)
    fe /= np.linalg.norm(fe, axis=-1, keepdims=True)
    scale = 14.0
    ti, te = torch.tensor(fi), torch.tensor(fe)
    logits = scale * ti @ te.T
    labels = torch.arange(6)
    ref = (F.cross_entropy(logits, labels)
           + F.cross_entropy(logits.T, labels)) / 2
    ours = clip_engine.clip_loss(jnp.asarray(fi), jnp.asarray(fe),
                                 jnp.asarray(scale))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_three_mod_loss_masking():
    rng = np.random.default_rng(2)
    n, d = 6, 8
    f = [rng.standard_normal((n, d)).astype(np.float32) for _ in range(3)]
    f = [x / np.linalg.norm(x, axis=-1, keepdims=True) for x in f]
    w1 = np.ones(n, np.float32)
    w2 = np.zeros(n, np.float32)  # enface2 absent everywhere
    loss = clip_engine.three_modality_clip_loss(
        *(jnp.asarray(x) for x in f), 10.0, 10.0, 10.0,
        jnp.asarray(w1), jnp.asarray(w2))
    # pairs involving enface2 must contribute exactly 0
    only12 = clip_engine.three_modality_clip_loss(
        *(jnp.asarray(x) for x in f), 10.0, 10.0, 10.0,
        jnp.asarray(w1), jnp.asarray(np.ones(n, np.float32)))
    assert float(loss) > 0
    # with w2=0: total = (l_it1 + l_t1i)/6; check equals clip-style pair
    pair = clip_engine.clip_loss(jnp.asarray(f[0]), jnp.asarray(f[1]), 10.0)
    np.testing.assert_allclose(float(loss), float(pair) * 2 / 6, rtol=1e-5)
    assert float(only12) != float(loss)


def test_retrieval_metrics_perfect_and_random():
    f = np.eye(8, 16).astype(np.float32)
    m = clip_engine.retrieval_metrics(f, f)
    assert m["image_to_enface_R@1"] == 1.0
    assert m["image_to_enface_mean_rank"] == 1.0
    rng = np.random.default_rng(0)
    a = rng.standard_normal((50, 4)).astype(np.float32)
    b = rng.standard_normal((50, 4)).astype(np.float32)
    m2 = clip_engine.retrieval_metrics(a, b)
    assert m2["image_to_enface_R@1"] < 0.5


def test_retrieval_dup_corrected():
    f = np.eye(6, 8).astype(np.float32)
    # two queries per group; exact match has same group -> rank 0
    groups = np.array([0, 0, 1, 1, 2, 2])
    m = clip_engine.retrieval_metrics_dup_corrected(f, f, groups)
    assert m["image_to_enface_corrected_R@1"] == 1.0


def test_clip_train_step_runs():
    from octcubem_tpu.train import optim
    from octcubem_tpu.train.train_state import TrainState

    m = coem.COEP2Tower(embed_dim=16, vision_cfg=V_CFG,
                        enface_cfg=E_CFG, attn_impl="naive")
    img, enf = _inputs()
    params = m.init(jax.random.key(0), img, enf)
    tx = optim.build_adamw(params, 1e-4)
    state = TrainState.create(params, tx, jax.random.key(1))
    step = clip_engine.make_clip_train_step(m, tx)
    state, metrics = step(state, {"image": img, "enface": enf})
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_lit_lock_scales_freeze_real_tower_paths():
    """Regression: the lock mask must actually match the COEM param
    paths ('params/visual/trunk/...').  The round-2 inline mask checked
    startswith('visual/') against paths rooted at 'params/', freezing
    NOTHING — a silent LiT no-op.  optim.lit_lock_scales strips the
    root; with depth=2 and 1 unlocked group only head-ish parts stay
    trainable."""
    from octcubem_tpu.train import optim

    m = coem.COEP2Tower(embed_dim=16, vision_cfg=V_CFG,
                        enface_cfg=E_CFG, attn_impl="naive")
    img, enf = _inputs(1)
    params = m.init(jax.random.key(0), img, enf)
    scales = optim.lit_lock_scales(params, depth=V_CFG["depth"],
                                   n_unlocked=1)
    flat = {}
    jax.tree_util.tree_map_with_path(
        lambda p, s: flat.__setitem__(
            "/".join(getattr(k, "key", str(k)) for k in p), s),
        scales)
    frozen = [k for k, s in flat.items() if s == 0.0]
    assert frozen, "lock mask froze nothing (the round-2 no-op)"
    # frozen params all live in the visual trunk; embeds + all blocks
    assert all(k.startswith("params/visual/") for k in frozen)
    assert any("patch_embed" in k for k in frozen)
    assert any("blocks_0" in k for k in frozen)
    assert any("blocks_1" in k for k in frozen)
    # enface tower + logit scale + head-ish visual parts stay trainable
    assert all(flat[k] == 1.0 for k in flat if k.startswith("params/enface"))
    assert all(flat[k] == 1.0 for k in flat if "aggregate_cls" in k)
    # with 2 unlocked groups the LAST block (+norm) becomes trainable
    scales2 = optim.lit_lock_scales(params, depth=V_CFG["depth"],
                                    n_unlocked=2)
    flat2 = {}
    jax.tree_util.tree_map_with_path(
        lambda p, s: flat2.__setitem__(
            "/".join(getattr(k, "key", str(k)) for k in p), s),
        scales2)
    assert all(s == 1.0 for k, s in flat2.items() if "blocks_1" in k)
    assert any(s == 0.0 for k, s in flat2.items() if "blocks_0" in k)

    def as_flat(scales):
        out = {}
        jax.tree_util.tree_map_with_path(
            lambda p, s: out.__setitem__(
                "/".join(getattr(k, "key", str(k)) for k in p), s), scales)
        return out

    # reference group arithmetic (models_vit_st_flash_attn_nodrop.py
    # :308-351): n_unlocked=0 freezes EVERYTHING in the tower (head too);
    # n_unlocked=1 unlocks ONLY the head group (final norm stays frozen);
    # n_unlocked=depth+2 unlocks the embeds group as well
    flat0 = as_flat(optim.lit_lock_scales(params, depth=V_CFG["depth"],
                                          n_unlocked=0))
    assert all(s == 0.0 for k, s in flat0.items()
               if k.startswith("params/visual/"))
    flat1 = as_flat(optim.lit_lock_scales(params, depth=V_CFG["depth"],
                                          n_unlocked=1))
    assert all(s == 0.0 for k, s in flat1.items()
               if k.startswith("params/visual/") and "/norm/" in k
               and "aggregate" not in k)
    flat_all = as_flat(optim.lit_lock_scales(
        params, depth=V_CFG["depth"], n_unlocked=V_CFG["depth"] + 2))
    assert all(s == 1.0 for s in flat_all.values())


@pytest.mark.slow
def test_lit_lock_partition_real_freeze():
    """Real LiT locking (optim.make_partition): frozen-param grads and
    optimizer moments are STRUCTURALLY absent (not just zero), frozen
    params never move, and the partitioned step updates the trainable
    split identically to the zero-scale fallback (reference lock()
    semantics, models_vit_st_flash_attn_nodrop.py:308-351)."""
    import optax
    from flax import traverse_util

    from octcubem_tpu.train import optim
    from octcubem_tpu.train.train_state import TrainState

    m = coem.COEP2Tower(embed_dim=16, vision_cfg=V_CFG,
                        enface_cfg=E_CFG, attn_impl="naive")
    img, enf = _inputs()
    params = m.init(jax.random.key(0), img, enf)

    # freeze the whole visual trunk except its final norm + head-ish parts
    def trainable(path, leaf):
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        return not (name.startswith("params/visual/")
                    and "blocks" in name)

    mask = jax.tree_util.tree_map_with_path(trainable, params)
    partition = optim.make_partition(mask)
    tr0, fz0 = partition[0](params)
    assert tr0 and fz0
    # numpy snapshots: the train steps donate the state, deleting the
    # original param buffers
    tr0_np = {k: np.asarray(v).copy() for k, v in tr0.items()}
    fz0_np = {k: np.asarray(v).copy() for k, v in fz0.items()}
    params_zs = jax.tree.map(jnp.array, params)  # independent buffers
    # grads structurally absent for frozen params: value_and_grad over the
    # trainable split returns a tree with ONLY trainable keys
    def loss_fn(tr):
        p = partition[1](tr, fz0)
        fi, fe, s = m.apply(p, img, enf)
        return clip_engine.clip_loss(fi, fe, s)

    grads = jax.grad(loss_fn)(tr0)
    assert set(grads.keys()) == set(tr0.keys())
    assert not (set(grads.keys()) & set(fz0.keys()))

    tx = optim.build_adamw(tr0, 1e-2)
    state = TrainState.create(params, tx, jax.random.key(1), tx_params=tr0)
    # moments structurally absent: adam mu covers the trainable split only
    mus = [s.mu for s in jax.tree.leaves(
        state.opt_state, is_leaf=lambda x: hasattr(x, "mu")) if hasattr(s, "mu")]
    assert mus
    mu_keys = set(traverse_util.flatten_dict(mus[0], sep="/"))
    assert mu_keys == set(tr0.keys())

    step = clip_engine.make_clip_train_step(m, tx, partition=partition)
    batch = {"image": img, "enface": enf}
    state1, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    tr1, fz1 = partition[0](state1.params)
    for k in fz0_np:  # frozen params bit-identical
        np.testing.assert_array_equal(np.asarray(fz1[k]), fz0_np[k])
    assert any(not np.allclose(np.asarray(tr1[k]), tr0_np[k])
               for k in tr0_np)

    # equivalence with the zero-scale fallback on the trainable split
    scales = jax.tree.map(lambda b: 1.0 if b else 0.0, mask)
    tx_zs = optax.chain(optim.build_adamw(params_zs, 1e-2),
                        optim.scale_by_tree(scales))
    state_zs = TrainState.create(params_zs, tx_zs, jax.random.key(1))
    step_zs = clip_engine.make_clip_train_step(m, tx_zs)
    state_zs1, metrics_zs = step_zs(state_zs, batch)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_zs["loss"]), rtol=1e-6)
    tr_zs1, fz_zs1 = partition[0](state_zs1.params)
    for k in tr0_np:
        np.testing.assert_allclose(np.asarray(tr1[k]), np.asarray(tr_zs1[k]),
                                   rtol=2e-5, atol=1e-6)

    # the partitioned step does measurably less COMPUTE: no backward
    # through the frozen blocks, no moment updates for frozen params
    def flops_of(step_fn, st, b):
        c = step_fn.lower(st, b).compile().cost_analysis()
        c = c[0] if isinstance(c, list) else c
        return float(c.get("flops", 0.0))

    f_part = flops_of(step, state1, batch)
    f_zs = flops_of(step_zs, state_zs1, batch)
    assert f_part < 0.9 * f_zs, (f_part, f_zs)


@pytest.mark.slow
def test_clip_accum_matches_full_batch_loss():
    """The feature-cached accumulation step must see the full effective
    batch as negatives (loss equals the full-batch loss at the same
    params)."""
    from octcubem_tpu.train import optim
    from octcubem_tpu.train.train_state import TrainState

    m = coem.COEP2Tower(embed_dim=16, vision_cfg=V_CFG,
                        enface_cfg=E_CFG, attn_impl="naive")
    img, enf = _inputs(b=8)
    params = m.init(jax.random.key(0), img, enf)
    tx = optim.build_adamw(params, 0.0)  # lr 0: params unchanged
    state = TrainState.create(params, tx, jax.random.key(1))
    # compute the full-batch reference BEFORE the (donating) accum step
    fi, fe, scale = m.apply(params, img, enf)
    full = clip_engine.clip_loss(fi, fe, scale)

    # full-batch gradient reference: summed chunk grads must reconstruct
    # it exactly (NOT divided by accum_freq — reference train_retclip.py
    # does one backward per chunk and a single optimizer.step)
    def loss_fn(p):
        i, e, s = m.apply(p, img, enf)
        return clip_engine.clip_loss(i, e, s)

    from octcubem_tpu.train.mae_engine import optax_global_norm
    full_gnorm = float(optax_global_norm(jax.grad(loss_fn)(params)))

    astep = clip_engine.make_clip_accum_train_step(m, tx, accum_freq=2)
    batch = {"image": img.reshape(2, 4, 6, 32, 32, 1),
             "enface": enf.reshape(2, 4, 32, 32, 3)}
    _, ametrics = astep(state, batch)
    np.testing.assert_allclose(float(ametrics["loss"]), float(full), rtol=1e-4)
    np.testing.assert_allclose(float(ametrics["grad_norm"]), full_gnorm,
                               rtol=1e-3)  # f32 order-of-summation noise


@pytest.mark.slow
def test_clip_accum_matches_full_batch_3mod():
    """3-mod feature-cached accumulation with stacked modality weights
    (train_retclip_3modalities.py:31-41) must reconstruct the full-batch
    loss AND gradient."""
    from octcubem_tpu.train import optim
    from octcubem_tpu.train.train_state import TrainState
    from octcubem_tpu.train.mae_engine import optax_global_norm

    m = coem.COEP3Tower(embed_dim=16, vision_cfg=V_CFG,
                        enface_cfg=E_CFG, attn_impl="naive")
    img, enf = _inputs(b=8)
    faf = enf[:, ::-1]
    w1 = jnp.ones(8)
    w2 = jnp.asarray([1, 1, 0, 1, 0, 1, 1, 0], jnp.float32)
    params = m.init(jax.random.key(0), img, enf, faf)
    tx = optim.build_adamw(params, 0.0)
    state = TrainState.create(params, tx, jax.random.key(1))

    def loss_fn(p):
        i, e1, e2, s0, s1, s2 = m.apply(p, img, enf, faf)
        return clip_engine.three_modality_clip_loss(
            i, e1, e2, s0, s1, s2, w1, w2)

    full = loss_fn(params)
    full_gnorm = float(optax_global_norm(jax.grad(loss_fn)(params)))

    astep = clip_engine.make_clip_accum_train_step_3mod(m, tx, accum_freq=2)
    batch = {"image": img.reshape(2, 4, 6, 32, 32, 1),
             "enface1": enf.reshape(2, 4, 32, 32, 3),
             "enface2": faf.reshape(2, 4, 32, 32, 3),
             "weight1": w1.reshape(2, 4), "weight2": w2.reshape(2, 4)}
    _, am = astep(state, batch)
    np.testing.assert_allclose(float(am["loss"]), float(full), rtol=1e-4)
    np.testing.assert_allclose(float(am["grad_norm"]), full_gnorm, rtol=1e-3)


def test_all_coem_configs_construct():
    """Every shipped JSON config (all 7 reference model_configs variants
    + the tiny test config) parses and constructs through the factory."""
    from octcubem_tpu.models import registry

    names = registry.list_coem_configs()
    assert len(names) >= 8
    for name in names:
        m = registry.create_coem_model(name)
        assert isinstance(m, (coem.COEP2Tower, coem.COEP3Tower))


def test_vision_tower_dispatch_vit2d_and_3dhead():
    """vision_cfg 'tower' selects the ViT_2Dhead / ViT_3Dhead branches
    (model.py:296-409): 2D RGB inputs, head doubles as CLIP projection."""
    enf = dict(img_size=32, patch_size=16, in_chans=3, embed_dim=32,
               depth=1, num_heads=2, parity="standard")
    m2 = coem.COEP2Tower(
        embed_dim=16, attn_impl="naive",
        vision_cfg=dict(tower="vit2d", img_size=32, patch_size=16,
                        in_chans=3, embed_dim=32, depth=1, num_heads=2,
                        parity="standard"),
        enface_cfg=enf)
    img2d = jnp.ones((2, 32, 32, 3))
    enf_img = jnp.ones((2, 32, 32, 3))
    p = m2.init(jax.random.key(0), img2d, enf_img)
    fi, fe, _ = m2.apply(p, img2d, enf_img)
    assert fi.shape == (2, 16) and fe.shape == (2, 16)

    m3 = coem.COEP2Tower(
        embed_dim=16, attn_impl="naive",
        vision_cfg=dict(tower="vit_3dhead", img_size=32, patch_size=16,
                        in_chans=3, embed_dim=32, depth=1, num_heads=2,
                        parity="standard"),
        enface_cfg=enf)
    vol = jnp.ones((2, 4, 32, 32, 3))  # [B, N_slices, H, W, C]
    p3 = m3.init(jax.random.key(0), vol, enf_img)
    fi3, fe3, _ = m3.apply(p3, vol, enf_img)
    assert fi3.shape == (2, 16) and fe3.shape == (2, 16)


def test_classification_variants():
    m = coem.COEP2TowerClassification(
        embed_dim=16, num_classes=3, vision_cfg=V_CFG, enface_cfg=E_CFG,
        attn_impl="naive")
    img, enf = _inputs(2)
    params = m.init(jax.random.key(0), img, enf)
    out, scale = m.apply(params, img, enf)
    assert out.shape == (2, 3)
    out_im, _ = m.apply(params, img, enf, single_modality="image")
    out_en, _ = m.apply(params, img, enf, single_modality="enface")
    assert not np.allclose(np.asarray(out_im), np.asarray(out_en))


def test_coem_json_config_registry():
    from octcubem_tpu.models import registry
    names = registry.list_coem_configs()
    assert "vitl16_octcube_ir" in names
    assert "vitl16_octcube_ef_3mod" in names
    # tiny config builds and runs end to end
    m = registry.create_coem_model("vitl16_octcube_ir_tiny_test",
                                   attn_impl="naive")
    img, enf = _inputs(2)
    params = m.init(jax.random.key(0), img, enf)
    fi, fe, scale = m.apply(params, img, enf)
    assert fi.shape == (2, 16)
    # classification wrapper from the same config
    mc = registry.create_coem_model("vitl16_octcube_ir_tiny_test",
                                    num_classes=3, attn_impl="naive")
    pc = mc.init(jax.random.key(1), img, enf)
    out, _ = mc.apply(pc, img, enf)
    assert out.shape == (2, 3)
