"""Optimizers: AdamW with the reference's weight-decay masking and
layer-wise LR decay, expressed as optax transforms over param paths.

Parity targets:
- no-weight-decay set = all 1D params + pos embeds / cls / mask tokens
  (OCTCube/util/lr_decay.py:28-31, models' no_weight_decay()).
- layer-wise lr decay (BEiT-style): scale = layer_decay ** (num_layers+1 -
  layer_id) with layer 0 = embeddings, i+1 = block i, num_layers+1 = head
  (OCTCube/util/lr_decay.py:9-70).
"""

from __future__ import annotations

import re
from typing import Callable

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def weight_decay_mask(params) -> "jax.tree_util.PyTreeDef":
    """True where weight decay applies: ndim > 1 and not a pos/cls/mask
    token embedding."""

    def decide(path, leaf):
        name = _path_str(path)
        if leaf.ndim <= 1:
            return False
        if any(t in name for t in ("pos_embed", "cls_token", "mask_token")):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def layer_decay_scales(params, num_blocks: int, layer_decay: float):
    """Per-param LR multipliers implementing BEiT layer decay.

    Our param paths: 'patch_embed/...', 'pos_embed*', 'cls_token',
    'blocks/blocks_{i}/...', everything else = head layer.
    """
    num_layers = num_blocks + 1
    scales = [layer_decay ** (num_layers - i) for i in range(num_layers + 1)]

    def layer_id(name: str) -> int:
        if name.startswith(("cls_token", "pos_embed", "patch_embed")):
            return 0
        m = re.search(r"blocks/blocks_(\d+)/", name)
        if m:
            return int(m.group(1)) + 1
        return num_layers

    def decide(path, leaf):
        return scales[layer_id(_path_str(path))]

    return jax.tree_util.tree_map_with_path(decide, params)


def scale_by_tree(scales) -> optax.GradientTransformation:
    """Multiply updates elementwise by a static per-param scalar pytree."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def lit_lock_scales(params, depth: int, n_unlocked: int,
                    tower_prefix: str = "visual/"):
    """Per-param trainable scales (1.0/0.0) for LiT image-tower locking.

    Group ordering per the reference lock() (models_vit_st_flash_attn_
    nodrop.py:308-351): ``[embeds+pos+cls, blocks 0..D-2, last block+norm,
    head group]`` — D+2 groups — and the last ``n_unlocked`` stay
    trainable, so n_unlocked=0 freezes EVERYTHING (incl. the head),
    1 unlocks only the head group, 2 adds the last block + final norm,
    and D+2 unlocks the embeds too.  Params outside ``tower_prefix`` are
    always trainable.  Feed the result to scale_by_tree (zero-scale
    fallback) or threshold >0 into make_partition (real freezing)."""
    n_groups = depth + 2
    first_unlocked = n_groups - n_unlocked  # group indices >= this train

    def scale(path, leaf):
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        name = name.removeprefix("params/")
        if not name.startswith(tower_prefix):
            return 1.0
        if any(t in name for t in ("fc_aggregate_cls", "aggregate_cls_norm",
                                   "head")):
            group = n_groups - 1
        elif (m := re.search(r"blocks/blocks_(\d+)/", name)):
            i = int(m.group(1))
            # blocks 0..D-2 are groups 1..D-1; the last block shares
            # group D with the final norm
            group = i + 1 if i < depth - 1 else depth
        elif "/norm/" in name:
            group = depth  # final norm, grouped with the last block
        else:
            group = 0  # patch_embed / pos embeds / cls_token
        return 1.0 if group >= first_unlocked else 0.0

    return jax.tree_util.tree_map_with_path(scale, params)


def make_partition(trainable_mask):
    """(split, merge) helpers for REAL parameter freezing (LiT lock).

    With the split applied before jax.value_and_grad, gradients are taken
    over the trainable subtree only: the frozen prefix of the tower is a
    constant of the loss, so autodiff never builds its backward pass, and
    an optimizer built over the trainable subtree carries NO moments for
    frozen params — matching the reference lock() semantics
    (requires_grad=False, models_vit_st_flash_attn_nodrop.py:308-351)
    rather than the zero-scaled-update fallback (optim.scale_by_tree),
    which still differentiates and stores moments for frozen params.

    trainable_mask: pytree of bools, same structure as params.
    """
    from flax import traverse_util

    mask_flat = traverse_util.flatten_dict(trainable_mask, sep="/")
    t_keys = {k for k, v in mask_flat.items() if v}

    def split(params):
        flat = traverse_util.flatten_dict(params, sep="/")
        tr = {k: v for k, v in flat.items() if k in t_keys}
        fz = {k: v for k, v in flat.items() if k not in t_keys}
        return tr, fz

    def merge(tr, fz):
        return traverse_util.unflatten_dict({**tr, **fz}, sep="/")

    return split, merge


def build_fused_adamw(
    params,
    learning_rate: float | Callable,
    weight_decay: float = 0.05,
    betas: tuple[float, float] = (0.9, 0.95),
    eps: float = 1e-8,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """Single-pass AdamW: ONE elementwise chain per leaf computes the
    bias-corrected Adam update + decoupled weight decay + LR in one go,
    instead of the optax.chain pipeline whose per-transform update trees
    can materialize as extra HBM round-trips between stages (measured
    experiment, NOTES_ROUND3.md).  Numerically equivalent to
    build_adamw with clip_grad=None (same eps placement, same wd mask);
    state is a standard optax.ScaleByAdamState so checkpoints stay
    interchangeable."""
    wd_mask = weight_decay_mask(params)
    b1, b2 = betas

    def init_fn(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype), params)
        nu = jax.tree.map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        assert params is not None, "fused adamw needs params (wd + dtype)"
        count = optax.safe_int32_increment(state.count)
        cf = count.astype(jnp.float32)
        c1 = 1.0 - b1 ** cf
        c2 = 1.0 - b2 ** cf
        # bias correction uses the post-increment count (optax
        # scale_by_adam), the schedule the PRE-increment step (optax
        # scale_by_learning_rate starts its own counter at 0)
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)

        def leaf(g, mu, nu, p, masked):
            g32 = g.astype(jnp.float32)
            mu2 = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g32
            nu2 = b2 * nu + (1.0 - b2) * (g32 * g32)
            u = (mu2 / c1) / (jnp.sqrt(nu2 / c2) + eps)
            if masked:
                u = u + weight_decay * p.astype(jnp.float32)
            return ((-lr * u).astype(p.dtype), mu2.astype(mu.dtype), nu2)

        zipped = jax.tree.map(leaf, updates, state.mu, state.nu, params,
                              wd_mask)
        is_t = lambda t: isinstance(t, tuple)  # noqa: E731
        u = jax.tree.map(lambda t: t[0], zipped, is_leaf=is_t)
        mu = jax.tree.map(lambda t: t[1], zipped, is_leaf=is_t)
        nu = jax.tree.map(lambda t: t[2], zipped, is_leaf=is_t)
        return u, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def build_adamw(
    params,
    learning_rate: float | Callable,
    weight_decay: float = 0.05,
    betas: tuple[float, float] = (0.9, 0.95),
    layer_decay: float | None = None,
    num_blocks: int | None = None,
    clip_grad: float | None = None,
    mu_dtype=None,
    force_chain: bool = False,
) -> optax.GradientTransformation:
    """AdamW matching the reference pretrain (betas 0.9/0.95) and finetune
    (layer decay 0.65) configurations.

    mu_dtype: storage dtype for the first moment (e.g. jnp.bfloat16) —
    halves the mu HBM traffic of the update step.  Default None keeps
    fp32 (the reference's torch Adam semantics); the second moment stays
    fp32 regardless (squares need the dynamic range).

    Without clip_grad/layer_decay this delegates to build_fused_adamw
    (single elementwise pass per leaf; numerically equivalent —
    test_fused_adamw_matches_optax_chain — and measured ~0.5ms faster on
    the ViT-L MAE step, NOTES_ROUND3.md).  NOTE the delegation changes
    the opt_state pytree (bare ScaleByAdamState instead of the chain
    tuple): resuming an orbax checkpoint written by the chain-built
    optimizer needs force_chain=True to reconstruct the old structure."""
    if force_chain:
        pass
    elif clip_grad is None and (layer_decay is None or layer_decay == 1.0):
        return build_fused_adamw(params, learning_rate, weight_decay,
                                 betas, mu_dtype=mu_dtype)
    txs = []
    if clip_grad is not None:
        txs.append(optax.clip_by_global_norm(clip_grad))
    txs.append(optax.scale_by_adam(b1=betas[0], b2=betas[1],
                                   mu_dtype=mu_dtype))
    txs.append(optax.add_decayed_weights(weight_decay, weight_decay_mask(params)))
    if layer_decay is not None and layer_decay != 1.0:
        assert num_blocks is not None
        txs.append(scale_by_tree(layer_decay_scales(params, num_blocks, layer_decay)))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*txs)
