"""Multi-device semantics: sharded execution must reproduce single-device
results (the pjit-replaces-DDP/all-gather claim, SURVEY §2.9)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from octcubem_tpu.core import mesh as meshlib
from octcubem_tpu.models import coem, mae3d
from octcubem_tpu.train import optim, clip_engine
from octcubem_tpu.train.train_state import TrainState
import pytest

V = dict(num_frames=6, t_patch_size=3, img_size=32, patch_size=16, in_chans=1,
         embed_dim=32, depth=2, num_heads=2)
E = dict(img_size=32, patch_size=16, in_chans=3, embed_dim=32, depth=2,
         num_heads=2)


@pytest.mark.slow
def test_clip_loss_sharded_equals_unsharded():
    m = coem.COEP2Tower(embed_dim=16, vision_cfg=V, enface_cfg=E,
                        attn_impl="naive")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((8, 6, 32, 32, 1)), jnp.float32)
    enf = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    params = m.init(jax.random.key(0), img, enf)

    def loss_fn(params, img, enf):
        fi, fe, s = m.apply(params, img, enf)
        return clip_engine.clip_loss(fi, fe, s)

    # single-device reference
    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, img, enf)

    mesh = meshlib.make_mesh(n_data=8, n_fsdp=1)
    with mesh:
        bsh = NamedSharding(mesh, P(meshlib.DATA_AXIS))
        rsh = NamedSharding(mesh, P())
        img_s = jax.device_put(img, bsh)
        enf_s = jax.device_put(enf, bsh)
        params_s = jax.device_put(params, rsh)
        loss_s, grads_s = jax.jit(jax.value_and_grad(loss_fn))(
            params_s, img_s, enf_s)
    np.testing.assert_allclose(float(loss_s), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads_s), jax.tree.leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_mae_step_runs_on_fsdp_mesh():
    m = mae3d.MaskedAutoencoderViT3D(
        input_size=32, high_res_input_size=64, patch_size=16, in_chans=1,
        embed_dim=64, depth=2, num_heads=2, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=6, t_patch_size=3,
        pred_t_dim=6, attn_impl="naive")
    x = jnp.ones((4, 6, 32, 32, 1))
    params = m.init({"params": jax.random.key(0), "masking": jax.random.key(1)},
                    x, mask_ratio=0.75)
    tx = optim.build_adamw(params, 1e-3)
    state = TrainState.create(params, tx, jax.random.key(2))
    from octcubem_tpu.train.mae_engine import make_mae_train_step

    mesh = meshlib.make_mesh(n_data=2, n_fsdp=4)
    with mesh:
        def pspec(path, leaf):
            return NamedSharding(mesh, meshlib.fsdp_param_spec(path, leaf))

        state = jax.tree_util.tree_map_with_path(
            lambda p, v: jax.device_put(v, pspec(p, v)), state)
        x_s = jax.device_put(x, NamedSharding(mesh, P(meshlib.DATA_AXIS)))
        step = make_mae_train_step(m, tx)
        state, metrics = step(state, x_s, mask_ratio=0.9)
    assert np.isfinite(float(metrics["loss"]))
    # params keep their fsdp shardings after the update
    big = state.params["params"]["blocks"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    assert not big.sharding.is_fully_replicated or big.size < 2**20
