"""MAE pretraining engine: jitted data-parallel train/eval steps.

TPU-native equivalent of Pre-training/engine_pretrain.py:29-205 —
the joint step consumes one 3D-volume batch plus one 2D high-res batch,
sums the losses, and returns per-frame losses for the SPL hardness dict.
The DDP all-reduce is replaced by pjit over a mesh: batches are sharded on
the 'data' axis, params replicated, and XLA emits the gradient psum.

bf16 activations, fp32 params/optimizer; no loss scaler (TPU bf16 needs
none — the reference's fp16 GradScaler is a CUDA artifact, SURVEY §2.9).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from .train_state import TrainState


def make_mae_train_step(model, tx, joint: bool = False,
                        use_premask: bool = False, accum_iter: int = 1,
                        compute_grad_norm: bool = True,
                        donate: bool = True, model2d=None,
                        accum_2d: int = 1):
    """Returns step(state, batch3d, mask_ratio, batch2d?, mask_ratio_2d?,
    pre_mask?) -> (state, metrics).

    model2d: optional module variant (same param structure — e.g. the
    same architecture with remat=True) applied to the 2D branch only.
    Lets the memory-heavy high-res 2D batch rematerialize while the 3D
    branch keeps the faster no-remat graph; on a 16GB v5e the joint
    headline config (3D b4 + 2D 512^2 b64) only fits with the 2D side
    rematerialized (NOTES_ROUND3.md "Joint step").

    mask ratios are static floats (recompiled per scheduled value — the 2D
    ratio changes once per epoch, so at most one recompile per epoch).

    use_premask=True computes the blank-region pre-mask INSIDE the step
    (one jit, patch embeddings computed once, no extra host round-trip —
    the reference runs a separate forward_patch_embed pass per step,
    engine_pretrain.py:110-122).

    accum_iter>1 (engine_pretrain.py:163-170 / engine_finetune.py:452-457):
    batches carry leading dims [accum_iter, micro, ...]; a lax.scan
    accumulates microbatch grads and applies ONE optimizer update with
    grads/accum_iter (each micro-loss is a mean over its microbatch, so
    the average reconstructs the effective-batch-mean gradient).

    accum_2d>1 (joint only, exclusive with accum_iter>1): microbatch ONLY
    the high-res 2D branch — batch2d carries [accum_2d, micro, ...] while
    the 3D batch goes through whole.  Peak activation memory for the 2D
    side drops by the accumulation factor WITHOUT rematerialization, so
    the joint headline config (3D b4 + 2D 512^2 b64) can run both
    branches remat-free on a 16GB chip: the remat recompute (a full 2D
    forward per step) is traded for sequential microbatches whose only
    overhead is the fp32 grad-buffer read-modify-write per chunk.
    Gradient math: total loss = loss3d + mean_k loss2d_k, so grads =
    grads3d + mean_k grads2d_k — identical to the fused joint loss.
    """

    def loss_fn(params, rng, batch3d, mask_ratio, batch2d, mask_ratio_2d,
                pre_mask):
        r3, r2 = jax.random.split(rng)
        if use_premask and pre_mask is None:
            from ..data.premask import compute_premask

            feat = jax.lax.stop_gradient(model.apply(
                params, batch3d, method=model.forward_patch_embed))
            pre_mask = compute_premask(feat, model.t_grid, model.grid)
        loss3d, frame_losses, _, _ = model.apply(
            params, batch3d, mask_ratio=mask_ratio, pre_mask=pre_mask,
            deterministic=False,
            rngs={"masking": r3, "dropout": r3})
        total = loss3d
        loss2d = jnp.zeros(())
        if joint:
            loss2d, _, _, _ = (model2d or model).apply(
                params, batch2d, mask_ratio=mask_ratio_2d,
                deterministic=False, rngs={"masking": r2, "dropout": r2})
            total = total + loss2d
        return total, (loss3d, loss2d, frame_losses)

    @functools.partial(jax.jit, static_argnames=("mask_ratio", "mask_ratio_2d"),
                       donate_argnums=(0,) if donate else ())
    def step(state: TrainState, batch3d, mask_ratio: float = 0.9,
             batch2d=None, mask_ratio_2d: float = 0.75, pre_mask=None):
        rng, new_rng = jax.random.split(state.rng)
        (total, (l3, l2, fl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, rng, batch3d, mask_ratio,
                                   batch2d, mask_ratio_2d, pre_mask)
        state = state.apply_gradients(tx, grads).replace(rng=new_rng)
        # the global-norm metric is an extra full read of all grads
        # (~1.2GB at ViT-L) unless XLA fuses it into the update pass;
        # compute_grad_norm=False drops it for throughput benches
        gn = (optax_global_norm(grads) if compute_grad_norm
              else jnp.zeros(()))
        metrics = {"loss": total, "loss_3d": l3, "loss_2d": l2,
                   "frame_losses": fl, "grad_norm": gn}
        return state, metrics

    @functools.partial(jax.jit, static_argnames=("mask_ratio", "mask_ratio_2d"),
                       donate_argnums=(0,))
    def accum_step(state: TrainState, batch3d, mask_ratio: float = 0.9,
                   batch2d=None, mask_ratio_2d: float = 0.75, pre_mask=None):
        assert pre_mask is None, "pass use_premask=True with accum_iter>1"
        rng, new_rng = jax.random.split(state.rng)
        rngs = jax.random.split(rng, accum_iter)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def body(carry, xs):
            grads_acc, tot, l3a, l2a = carry
            r = xs[0]
            b3 = xs[1]
            b2 = xs[2] if joint else None
            (total, (l3, l2, fl)), g = grad_fn(
                state.params, r, b3, mask_ratio, b2, mask_ratio_2d, None)
            return (jax.tree.map(jnp.add, grads_acc, g),
                    tot + total, l3a + l3, l2a + l2), fl

        zero = jax.tree.map(jnp.zeros_like, state.params)
        xs = (rngs, batch3d) + ((batch2d,) if joint else ())
        (grads, tot, l3, l2), fls = jax.lax.scan(
            body, (zero, 0.0, 0.0, 0.0), xs)
        grads = jax.tree.map(lambda g: g / accum_iter, grads)
        state = state.apply_gradients(tx, grads).replace(rng=new_rng)
        metrics = {"loss": tot / accum_iter, "loss_3d": l3 / accum_iter,
                   "loss_2d": l2 / accum_iter,
                   # [accum, micro, t] -> [accum*micro, t] (loader order)
                   "frame_losses": fls.reshape(-1, fls.shape[-1]),
                   "grad_norm": (optax_global_norm(grads)
                                 if compute_grad_norm else jnp.zeros(()))}
        return state, metrics

    @functools.partial(jax.jit, static_argnames=("mask_ratio", "mask_ratio_2d"),
                       donate_argnums=(0,) if donate else ())
    def accum2d_step(state: TrainState, batch3d, mask_ratio: float = 0.9,
                     batch2d=None, mask_ratio_2d: float = 0.75,
                     pre_mask=None):
        rng, new_rng = jax.random.split(state.rng)
        r3, r2 = jax.random.split(rng)

        def loss3d_fn(params):
            pm = pre_mask
            if use_premask and pm is None:
                from ..data.premask import compute_premask

                feat = jax.lax.stop_gradient(model.apply(
                    params, batch3d, method=model.forward_patch_embed))
                pm = compute_premask(feat, model.t_grid, model.grid)
            loss3d, frame_losses, _, _ = model.apply(
                params, batch3d, mask_ratio=mask_ratio, pre_mask=pm,
                deterministic=False, rngs={"masking": r3, "dropout": r3})
            return loss3d, frame_losses

        (l3, fl), grads = jax.value_and_grad(
            loss3d_fn, has_aux=True)(state.params)

        r2s = jax.random.split(r2, accum_2d)

        def body(carry, xs):
            grads_acc, l2a = carry
            r, b2 = xs

            def loss2d_fn(params):
                loss2d, _, _, _ = (model2d or model).apply(
                    params, b2, mask_ratio=mask_ratio_2d,
                    deterministic=False, rngs={"masking": r, "dropout": r})
                return loss2d

            l2, g = jax.value_and_grad(loss2d_fn)(state.params)
            # accumulate g/K in place (carry starts as the 3D grads) —
            # one fp32 grad buffer total, no second accumulator
            return (jax.tree.map(lambda a, b: a + b / accum_2d,
                                 grads_acc, g), l2a + l2), None

        (grads, l2sum), _ = jax.lax.scan(body, (grads, 0.0), (r2s, batch2d))
        l2 = l2sum / accum_2d
        state = state.apply_gradients(tx, grads).replace(rng=new_rng)
        gn = (optax_global_norm(grads) if compute_grad_norm
              else jnp.zeros(()))
        metrics = {"loss": l3 + l2, "loss_3d": l3, "loss_2d": l2,
                   "frame_losses": fl, "grad_norm": gn}
        return state, metrics

    if accum_iter > 1:
        if accum_2d != 1:
            raise ValueError("accum_iter and accum_2d are exclusive")
        return accum_step
    if accum_2d > 1:
        if not joint:
            raise ValueError(
                "accum_2d microbatches the 2D branch of a joint step")
        return accum2d_step
    return step


def make_mae_eval_step(model):
    @jax.jit
    def eval_step(params, batch, rng):
        loss, frame_losses, pred, mask = model.apply(
            params, batch, mask_ratio=0.75, rngs={"masking": rng})
        return {"loss": loss, "frame_losses": frame_losses,
                "pred": pred, "mask": mask}

    return eval_step


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def shard_batch(batch, mesh):
    """Place a host batch sharded over the data axis.

    Multi-process runs treat ``batch`` as this host's LOCAL shard (the
    per-host loader stride) and assemble the global array — device_put
    cannot place onto non-addressable devices (core/multihost.py)."""
    if jax.process_count() > 1:
        from ..core import multihost

        return jax.tree.map(
            lambda x: multihost.global_batch(mesh, x, DATA_AXIS), batch)
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_microbatch(batch, mesh):
    """Place an [accum, micro, ...] batch with the MICRO axis sharded
    over the data axis (accumulation chunks stay whole per device).
    Multi-process: dim 1 is this host's micro shard."""
    if jax.process_count() > 1:
        from ..core import multihost

        return jax.tree.map(
            lambda x: multihost.global_batch(mesh, x, DATA_AXIS,
                                             micro_axis=True), batch)
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(state, mesh):
    if jax.process_count() > 1:
        from ..core import multihost

        return multihost.put_tree(mesh, state)
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)
