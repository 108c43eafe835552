import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from octcubem_tpu.train import losses, optim, schedules


def _torch_wlsce(x, target, smoothing=0.1):
    """Oracle: reference WeightedLabelSmoothingCrossEntropy semantics."""
    valid = (target.sum(dim=-1) != 0).float()
    if valid.sum() == 0:
        return x.mean() * 0
    logprobs = F.log_softmax(x, dim=-1)
    idx = target.argmax(dim=-1)
    nll = -logprobs.gather(-1, idx.unsqueeze(1)).squeeze(1)
    smooth = -logprobs.mean(dim=-1)
    loss = (1 - smoothing) * nll + smoothing * smooth
    return (loss * valid).sum() / valid.sum()


def test_weighted_label_smoothing_ce_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 2)).astype(np.float32)
    t = np.zeros((6, 2), np.float32)
    t[0, 0] = 1; t[1, 1] = 1; t[2, 1] = 1; t[3, 0] = 1  # rows 4,5 invalid
    ref = float(_torch_wlsce(torch.tensor(x), torch.tensor(t)))
    ours = float(losses.weighted_label_smoothing_ce(jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_multi_task_loss_matches_oracle():
    """Oracle built from the reference multi_task_loss composition
    (engine_finetune.py:45-70)."""
    rng = np.random.default_rng(1)
    b, ncls = 5, 4  # 3 tasks
    logits = rng.standard_normal((b, 2 * (ncls - 1))).astype(np.float32)
    target = (rng.random((b, ncls)) > 0.5).astype(np.float32)

    tl = torch.tensor(logits).reshape(b, ncls - 1, 2)
    tt = torch.tensor(target)
    total = 0.0
    wsum = 0.0
    for i in range(ncls - 1):
        ti = torch.stack([tt[:, 0], tt[:, i + 1]], dim=1)
        total = total + _torch_wlsce(tl[:, i], ti)
        wsum += float(ti.sum())
    ref = float(total) / (wsum + 1e-8)

    ours = float(losses.multi_task_loss(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_bce_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    t = (rng.random((4, 8)) > 0.5).astype(np.float32)
    ref = float(F.binary_cross_entropy_with_logits(torch.tensor(x), torch.tensor(t)))
    ours = float(losses.bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_layer_decay_scales():
    params = {
        "patch_embed": {"kernel": jnp.zeros((2, 2))},
        "cls_token": jnp.zeros((1, 1, 4)),
        "blocks": {
            "blocks_0": {"mixer": {"Wqkv": {"kernel": jnp.zeros((4, 12))}}},
            "blocks_1": {"mixer": {"Wqkv": {"kernel": jnp.zeros((4, 12))}}},
        },
        "head": {"kernel": jnp.zeros((4, 2))},
    }
    scales = optim.layer_decay_scales(params, num_blocks=2, layer_decay=0.5)
    # num_layers = 3; scale(layer_id) = 0.5 ** (3 - id)
    assert scales["patch_embed"]["kernel"] == 0.5 ** 3
    assert scales["blocks"]["blocks_0"]["mixer"]["Wqkv"]["kernel"] == 0.5 ** 2
    assert scales["blocks"]["blocks_1"]["mixer"]["Wqkv"]["kernel"] == 0.5 ** 1
    assert scales["head"]["kernel"] == 1.0


def test_weight_decay_mask():
    params = {
        "pos_embed_spatial": jnp.zeros((1, 4, 8)),
        "norm": {"scale": jnp.zeros((8,)), "bias": jnp.zeros((8,))},
        "mlp": {"fc1": {"kernel": jnp.zeros((8, 32)), "bias": jnp.zeros((32,))}},
    }
    mask = optim.weight_decay_mask(params)
    assert mask["pos_embed_spatial"] is False
    assert mask["norm"]["scale"] is False
    assert mask["mlp"]["fc1"]["kernel"] is True
    assert mask["mlp"]["fc1"]["bias"] is False


def test_warmup_half_cosine_shape():
    import math
    s = schedules.warmup_half_cosine(1e-3, 0.0, warmup_epochs=5,
                                     total_epochs=50, steps_per_epoch=10)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(25)), 1e-3 * 2.5 / 5)
    np.testing.assert_allclose(float(s(50)), 1e-3)  # end of warmup
    # reference formula at epoch 27.5
    epoch = 27.5
    ref = 0.0 + (1e-3 - 0.0) * 0.5 * (1 + math.cos(math.pi * (epoch - 5) / 45))
    np.testing.assert_allclose(float(s(275)), ref, rtol=1e-6)


def test_spl_schedules():
    assert schedules.spl_k_schedule(5, 0.7, 0.3, 100, 10) == 0.7
    assert schedules.spl_k_schedule(100, 0.7, 0.3, 100, 10) < 0.31
    assert schedules.mask_ratio_2d_schedule(5) == 0.75
    assert abs(schedules.mask_ratio_2d_schedule(100) - 0.85) < 1e-6


def test_metrics_multi_task_runs():
    from octcubem_tpu.train import metrics
    rng = np.random.default_rng(3)
    y_true = (rng.random((40, 4)) > 0.5).astype(np.int64)
    y_pred = rng.standard_normal((40, 6)).astype(np.float32)
    m = metrics.compute_metrics("multi_task_default", y_true, y_pred)
    assert set(metrics.METRIC_NAMES) == set(m.keys())
    assert len(m["roc"]["classwise"]) == 3
    assert 0 <= m["roc"]["macro"] <= 1


def test_multi_task_single_class_excluded_from_macro():
    """A task whose valid samples are all one class must be EXCLUDED
    from the macro (the reference skips it, engine_finetune.py:86-242) —
    not silently scored 0.5/0.0."""
    from octcubem_tpu.train import metrics as metrics_lib

    rng = np.random.default_rng(0)
    n = 40
    # col 0 = normal flag; task 1 mixed; task 2 never positive -> its
    # valid samples (the normals) are all class 0: single-class task
    y_true = np.zeros((n, 3), np.int64)
    y_true[: n // 2, 0] = 1
    y_true[n // 2:, 1] = 1
    logits = rng.standard_normal((n, 4))
    out = metrics_lib.multi_task_metrics(y_true, logits)
    assert np.isnan(out["roc"]["classwise"][1])
    # macro equals task-0's value alone (nanmean over [v, nan])
    np.testing.assert_allclose(out["roc"]["macro"], out["roc"]["classwise"][0])


def test_write_confusion_matrices(tmp_path):
    from octcubem_tpu.train.finetune_engine import write_confusion_matrices

    rng = np.random.default_rng(1)
    # multi-class
    yt = rng.integers(0, 3, 30)
    yp = rng.standard_normal((30, 3))
    paths = write_confusion_matrices(yt, yp, "multi_cls", str(tmp_path), "t")
    assert len(paths) == 1 and all(os.path.exists(p) for p in paths)
    # multi-task: one image per valid task
    y_true = np.zeros((30, 3), np.int64)
    y_true[:15, 0] = 1
    y_true[15:, 1] = 1
    y_true[20:, 2] = 1
    logits = rng.standard_normal((30, 4))
    paths = write_confusion_matrices(y_true, logits, "multi_task_default",
                                     str(tmp_path), "t2", ["AMD", "DME"])
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    # regression: none
    assert write_confusion_matrices(yt, yp[:, 0], "regression",
                                    str(tmp_path), "t3") == []


def test_metrics_regression():
    from octcubem_tpu.train import metrics
    y = np.linspace(0, 1, 20)
    m = metrics.compute_metrics("regression", y, y + 0.01)
    assert m["pearson_r"] > 0.99 and m["r2"] > 0.98


def test_best_tracker_regression_mode():
    from octcubem_tpu.train.finetune_engine import BestTracker
    t = BestTracker(patience=2)
    assert t.update(0, {"pearson_r": 0.2, "mse": 1.0}) is True
    assert t.update(1, {"pearson_r": 0.5, "mse": 0.8}) is True
    assert t.update(2, {"pearson_r": 0.4, "mse": 0.5}) is False
    # tie on pearson -> lower mse wins
    assert t.update(3, {"pearson_r": 0.5, "mse": 0.4}) is True
    assert t.best_epoch == 3


def test_best_tracker_classification_mode():
    from octcubem_tpu.train.finetune_engine import BestTracker
    t = BestTracker(patience=1)
    m = lambda auc, pr: {"roc": {"macro": auc}, "auprc": {"macro": pr}}
    assert t.update(0, m(0.6, 0.5)) is True
    assert t.update(1, m(0.6, 0.6)) is True   # AUPRC tie-break
    assert t.update(2, m(0.5, 0.9)) is False
    assert t.should_stop


def test_fused_adamw_matches_optax_chain():
    """build_fused_adamw (single-pass update) must match build_adamw
    (optax.chain pipeline) step for step: same updates, same moments,
    interchangeable ScaleByAdamState checkpoints."""
    import jax
    import jax.numpy as jnp

    from octcubem_tpu.train import optim

    rng = np.random.default_rng(5)
    params = {
        "dense": {"kernel": jnp.asarray(rng.standard_normal((8, 16)),
                                        jnp.float32),
                  "bias": jnp.asarray(rng.standard_normal(16), jnp.float32)},
        "pos_embed": jnp.asarray(rng.standard_normal((1, 4, 16)),
                                 jnp.float32),
    }
    sched = lambda step: 1e-2 / (1 + 0.1 * step)
    # force_chain pins the optax.chain path (plain build_adamw DELEGATES
    # to the fused impl, which would make this test compare fused
    # against itself)
    tx_ref = optim.build_adamw(params, sched, weight_decay=0.05,
                               force_chain=True)
    tx_fused = optim.build_fused_adamw(params, sched, weight_decay=0.05)
    s_ref = tx_ref.init(params)
    s_fused = tx_fused.init(params)
    p_ref = params
    p_fused = jax.tree.map(jnp.array, params)
    for i in range(3):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                np.random.default_rng(i).standard_normal(p.shape),
                jnp.float32), p_ref)
        import optax

        u1, s_ref = tx_ref.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u1)
        u2, s_fused = tx_fused.update(grads, s_fused, p_fused)
        p_fused = optax.apply_updates(p_fused, u2)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # moments interchangeable (ScaleByAdamState in both)
    mu_ref = [s for s in jax.tree.leaves(
        s_ref, is_leaf=lambda x: hasattr(x, "mu")) if hasattr(s, "mu")][0].mu
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(mu_ref)[0]),
        np.asarray(jax.tree.leaves(s_fused.mu)[0]), rtol=1e-6)


@pytest.mark.slow
def test_joint_step_model2d_remat_matches_plain():
    """model2d (remat=True variant on the 2D branch) must be a pure
    memory/compute tradeoff: same params, same losses, same update.

    The hybrid lets the 512^2 2D batch rematerialize while the 3D side
    keeps the no-remat graph (mae_engine.make_mae_train_step model2d;
    the full joint headline config only fits one v5e with it)."""
    from octcubem_tpu.models import mae3d
    from octcubem_tpu.train.mae_engine import make_mae_train_step
    from octcubem_tpu.train.train_state import TrainState

    kw = dict(input_size=32, high_res_input_size=64, patch_size=16,
              in_chans=1, embed_dim=32, depth=2, num_heads=2,
              decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
              num_frames=6, t_patch_size=3, pred_t_dim=6,
              attn_impl="naive")
    m = mae3d.MaskedAutoencoderViT3D(**kw)
    m2d = mae3d.MaskedAutoencoderViT3D(**kw, remat=True)
    x3 = jax.random.normal(jax.random.key(0), (2, 6, 32, 32, 1))
    x2 = jax.random.normal(jax.random.key(1), (2, 3, 64, 64, 1))
    params = m.init({"params": jax.random.key(2),
                     "masking": jax.random.key(3)}, x3, mask_ratio=0.75)
    sched = schedules.warmup_half_cosine(1e-3, 0.0, 1, 2, 10)
    tx = optim.build_adamw(params, sched, weight_decay=0.05)

    def one(step):
        # fresh param buffers per run — the step donates its state
        st = TrainState.create(jax.tree.map(jnp.array, params), tx,
                               jax.random.key(4))
        st, metrics = step(st, x3, mask_ratio=0.75, batch2d=x2,
                           mask_ratio_2d=0.75)
        return st, metrics

    s_ref, m_ref = one(make_mae_train_step(m, tx, joint=True))
    s_hyb, m_hyb = one(make_mae_train_step(m, tx, joint=True, model2d=m2d))
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_hyb["loss"]),
                               rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        s_ref.params, s_hyb.params)


@pytest.mark.slow
def test_joint_step_accum2d_matches_manual_grads():
    """accum_2d (2D-branch-only microbatching) must reproduce the fused
    joint gradient: grads3d + mean_k grads2d_k with the engine's exact
    rng derivation.  This is the remat-free path for the joint headline
    config (mae_engine accum_2d; trades the 2D remat recompute for
    sequential microbatches)."""
    from octcubem_tpu.models import mae3d
    from octcubem_tpu.train.mae_engine import make_mae_train_step
    from octcubem_tpu.train.train_state import TrainState

    kw = dict(input_size=32, high_res_input_size=64, patch_size=16,
              in_chans=1, embed_dim=32, depth=2, num_heads=2,
              decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
              num_frames=6, t_patch_size=3, pred_t_dim=6,
              attn_impl="naive")
    m = mae3d.MaskedAutoencoderViT3D(**kw)
    x3 = jax.random.normal(jax.random.key(0), (2, 6, 32, 32, 1))
    # [accum_2d=2, micro=2, ...] for the engine; flat [4, ...] for manual
    x2 = jax.random.normal(jax.random.key(1), (2, 2, 3, 64, 64, 1))
    params = m.init({"params": jax.random.key(2),
                     "masking": jax.random.key(3)}, x3, mask_ratio=0.75)
    sched = schedules.warmup_half_cosine(1e-3, 0.0, 1, 2, 10)
    tx = optim.build_adamw(params, sched, weight_decay=0.05)
    rng0 = jax.random.key(4)

    st = TrainState.create(jax.tree.map(jnp.array, params), tx, rng0)
    step = make_mae_train_step(m, tx, joint=True, accum_2d=2, donate=False)
    st_out, metrics = step(st, x3, mask_ratio=0.75, batch2d=x2,
                           mask_ratio_2d=0.75)

    # manual: same rng derivation as the engine
    rng, _ = jax.random.split(rng0)
    r3, r2 = jax.random.split(rng)
    r2s = jax.random.split(r2, 2)

    def total_loss(p):
        l3, _, _, _ = m.apply(p, x3, mask_ratio=0.75, deterministic=False,
                              rngs={"masking": r3, "dropout": r3})
        l2s = [m.apply(p, x2[k], mask_ratio=0.75, deterministic=False,
                       rngs={"masking": r2s[k], "dropout": r2s[k]})[0]
               for k in range(2)]
        return l3 + (l2s[0] + l2s[1]) / 2.0

    loss, grads = jax.value_and_grad(total_loss)(st.params)
    np.testing.assert_allclose(float(metrics["loss"]), float(loss),
                               rtol=1e-6)
    expected = TrainState.create(
        jax.tree.map(jnp.array, st.params), tx, rng0).apply_gradients(
            tx, grads)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        st_out.params, expected.params)


def test_joint_step_variants_fast_smoke():
    """Fast-split coverage of all three joint-step variants (plain,
    model2d remat, accum_2d): one tiny step each — finite losses, params
    actually update.  Full gradient-equivalence versions are the slow
    tests above."""
    from octcubem_tpu.models import mae3d
    from octcubem_tpu.train.mae_engine import make_mae_train_step
    from octcubem_tpu.train.train_state import TrainState

    kw = dict(input_size=16, high_res_input_size=32, patch_size=8,
              in_chans=1, embed_dim=16, depth=1, num_heads=2,
              decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
              num_frames=2, t_patch_size=1, pred_t_dim=2,
              attn_impl="naive")
    m = mae3d.MaskedAutoencoderViT3D(**kw)
    m2d = mae3d.MaskedAutoencoderViT3D(**kw, remat=True)
    x3 = jax.random.normal(jax.random.key(0), (2, 2, 16, 16, 1))
    x2_flat = jax.random.normal(jax.random.key(1), (2, 1, 32, 32, 1))
    x2_micro = x2_flat.reshape(2, 1, 1, 32, 32, 1)
    params = m.init({"params": jax.random.key(2),
                     "masking": jax.random.key(3)}, x3, mask_ratio=0.5)
    # warmup 0: step 0 must run at base_lr, not lr=0, for params to move
    sched = schedules.warmup_half_cosine(1e-3, 0.0, 0, 2, 10)
    tx = optim.build_adamw(params, sched, weight_decay=0.05)

    variants = [
        make_mae_train_step(m, tx, joint=True, donate=False),
        make_mae_train_step(m, tx, joint=True, model2d=m2d, donate=False),
        make_mae_train_step(m, tx, joint=True, accum_2d=2, donate=False),
    ]
    for i, step in enumerate(variants):
        st = TrainState.create(jax.tree.map(jnp.array, params), tx,
                               jax.random.key(4))
        b2 = x2_micro if i == 2 else x2_flat
        st2, metrics = step(st, x3, mask_ratio=0.5, batch2d=b2,
                            mask_ratio_2d=0.5)
        assert np.isfinite(float(metrics["loss"])), (i, metrics["loss"])
        assert float(metrics["loss_2d"]) > 0.0, i
        # params actually moved somewhere in the tree (individual leaves
        # like zero-init tokens can legitimately stay still for a step)
        moved = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(jax.tree.leaves(st.params),
                            jax.tree.leaves(st2.params)))
        assert moved > 0.0, i
