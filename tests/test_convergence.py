"""Training-convergence canaries: tiny models must actually learn.

Catches silent gradient/optimizer bugs that shape tests cannot (e.g. a
masked loss that ignores the prediction, a zero-lr mask covering
everything, broken custom-vjp)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from octcubem_tpu.models import mae3d, vit_st
from octcubem_tpu.train import optim, losses
from octcubem_tpu.train.train_state import TrainState
from octcubem_tpu.train.mae_engine import make_mae_train_step
from octcubem_tpu.train.finetune_engine import make_finetune_train_step

pytestmark = pytest.mark.slow  # heavy CLI/e2e drives: -m 'not slow' skips


def test_mae_loss_decreases():
    m = mae3d.MaskedAutoencoderViT3D(
        input_size=32, high_res_input_size=64, patch_size=16, in_chans=1,
        embed_dim=64, depth=2, num_heads=2, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=6, t_patch_size=3,
        pred_t_dim=6, attn_impl="naive")
    x = jax.random.uniform(jax.random.key(0), (4, 6, 32, 32, 1))
    params = m.init({"params": jax.random.key(1), "masking": jax.random.key(2)},
                    x, mask_ratio=0.75)
    tx = optim.build_adamw(params, 3e-3)
    state = TrainState.create(params, tx, jax.random.key(3))
    step = make_mae_train_step(m, tx)
    first = last = None
    for i in range(30):
        state, metrics = step(state, x, mask_ratio=0.75)
        if i == 0:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert last < 0.7 * first, (first, last)


def test_mae_accum_matches_manual_microbatch_grads():
    """accum_iter microbatching (lax.scan) must equal the manual
    average of per-microbatch grads at the same rng sequence
    (engine_pretrain.py:163-170 semantics: one optimizer update on the
    effective-batch-mean gradient)."""
    from octcubem_tpu.train.mae_engine import optax_global_norm

    m = mae3d.MaskedAutoencoderViT3D(
        input_size=32, high_res_input_size=64, patch_size=16, in_chans=1,
        embed_dim=64, depth=2, num_heads=2, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=6, t_patch_size=3,
        pred_t_dim=6, attn_impl="naive")
    x = jax.random.uniform(jax.random.key(0), (8, 6, 32, 32, 1))
    params = m.init({"params": jax.random.key(1), "masking": jax.random.key(2)},
                    x, mask_ratio=0.75)
    tx = optim.build_adamw(params, 0.0)
    state = TrainState.create(params, tx, jax.random.key(3))

    # manual reference reproducing the engine's rng sequence
    rng, _ = jax.random.split(state.rng)
    rngs = jax.random.split(rng, 2)
    xs = x.reshape(2, 4, 6, 32, 32, 1)

    def chunk_loss(p, r, b):
        r3, _ = jax.random.split(r)
        loss, _, _, _ = m.apply(p, b, mask_ratio=0.75, deterministic=False,
                                rngs={"masking": r3, "dropout": r3})
        return loss

    grads = [jax.grad(chunk_loss)(state.params, rngs[i], xs[i])
             for i in range(2)]
    mean_grads = jax.tree.map(lambda a, b: (a + b) / 2, *grads)
    want_norm = float(optax_global_norm(mean_grads))
    want_loss = float(sum(chunk_loss(state.params, rngs[i], xs[i])
                          for i in range(2)) / 2)

    astep = make_mae_train_step(m, tx, accum_iter=2)
    _, metrics = astep(state, xs, mask_ratio=0.75)
    np.testing.assert_allclose(float(metrics["loss"]), want_loss, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["grad_norm"]), want_norm,
                               rtol=1e-4)
    assert metrics["frame_losses"].shape == (8, 2)


def test_finetune_nan_recovery_path():
    """Non-finite loss: params/opt_state revert, rng advances, and the
    NEXT step trains normally — the recovery path behind the documented
    deviation from the reference's halve-LR-and-continue
    (main_finetune…singlefold.py:668-672)."""
    import jax.numpy as jnp

    from octcubem_tpu.train.finetune_engine import make_finetune_train_step

    m = vit_st.VisionTransformerST(
        num_frames=6, t_patch_size=3, img_size=32, patch_size=16,
        in_chans=1, num_classes=2, embed_dim=32, depth=1, num_heads=2,
        attn_impl="naive")
    x = jax.random.uniform(jax.random.key(0), (4, 6, 32, 32, 1))
    y = jnp.array([0, 1, 0, 1])
    params = m.init(jax.random.key(1), x)
    tx = optim.build_adamw(params, 1e-3)
    state = TrainState.create(params, tx, jax.random.key(2))

    def crit(logits, targets):
        ce = -jax.nn.log_softmax(logits)[jnp.arange(len(targets)), targets]
        # poison the loss when the batch is marked (targets all 9)
        return jnp.where((targets == 9).all(), jnp.nan, ce.mean())

    step = make_finetune_train_step(m, tx, crit)
    p0 = np.asarray(jax.tree.leaves(state.params)[0])
    rng0 = np.asarray(jax.random.key_data(state.rng))  # before donation
    state, metrics = step(state, x, jnp.full((4,), 9))
    assert not bool(metrics["finite"])
    # params reverted exactly; rng advanced (next retry != same dropout)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.params)[0]), p0)
    assert not np.array_equal(
        np.asarray(jax.random.key_data(state.rng)), rng0)
    # the next (clean) step updates params and reports finite
    state, metrics = step(state, x, y)
    assert bool(metrics["finite"])
    assert not np.array_equal(
        np.asarray(jax.tree.leaves(state.params)[0]), p0)


def test_classifier_fits_separable_data():
    m = vit_st.VisionTransformerST(
        num_frames=6, t_patch_size=3, img_size=32, patch_size=16, in_chans=1,
        num_classes=2, embed_dim=32, depth=2, num_heads=2,
        head_type="aggregate", attn_impl="naive")
    rng = np.random.default_rng(0)
    y = np.arange(8) % 2
    x = rng.random((8, 6, 32, 32, 1)).astype(np.float32) + y[:, None, None, None, None] * 0.5
    x, y = jnp.asarray(x), jnp.asarray(y)
    params = m.init(jax.random.key(1), x)
    tx = optim.build_adamw(params, 1e-3)
    state = TrainState.create(params, tx, jax.random.key(2))
    step = make_finetune_train_step(m, tx, losses.make_criterion("multi_cls",
                                                                 smoothing=0.0))
    for _ in range(40):
        state, metrics = step(state, x, y)
    logits = m.apply(state.params, x)
    acc = float((jnp.argmax(logits, -1) == y).mean())
    assert acc == 1.0, acc


def test_mae_bf16_mu_converges_like_fp32():
    """Opt-in bf16 Adam first moment (build_adamw mu_dtype): the tiny MAE
    reaches a final loss close to the fp32-mu run — the numerics
    deviation is benign (second moment stays fp32)."""
    import jax.numpy as jnp

    m = mae3d.MaskedAutoencoderViT3D(
        input_size=32, high_res_input_size=64, patch_size=16, in_chans=1,
        embed_dim=64, depth=2, num_heads=2, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=6, t_patch_size=3,
        pred_t_dim=6, attn_impl="naive")
    x = jax.random.uniform(jax.random.key(0), (4, 6, 32, 32, 1))
    params = m.init({"params": jax.random.key(1), "masking": jax.random.key(2)},
                    x, mask_ratio=0.75)

    def run(mu_dtype):
        # fresh buffers per run: the train step donates its state
        p = jax.tree.map(jnp.copy, params)
        tx = optim.build_adamw(p, 3e-3, mu_dtype=mu_dtype)
        state = TrainState.create(p, tx, jax.random.key(3))
        step = make_mae_train_step(m, tx)
        last = None
        for _ in range(30):
            state, metrics = step(state, x, mask_ratio=0.75)
            last = float(metrics["loss"])
        return last

    fp32_last = run(None)
    bf16_last = run(jnp.bfloat16)
    assert abs(bf16_last - fp32_last) < 0.1 * fp32_last, (fp32_last, bf16_last)
