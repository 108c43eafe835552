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
    nodrop.py:308-351): [embeds+pos+cls, blocks 0..D-2, last block+norm,
    head group]; the last ``n_unlocked`` groups stay trainable.  Params
    outside ``tower_prefix`` are always trainable.  Feed the result to
    scale_by_tree (zero-scale fallback) or threshold >0 into
    make_partition (real freezing)."""
    first_unlocked_block = depth + 1 - (n_unlocked - 1)

    def scale(path, leaf):
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        name = name.removeprefix("params/")
        if not name.startswith(tower_prefix):
            return 1.0
        if any(t in name for t in ("fc_aggregate_cls", "aggregate_cls_norm",
                                   "head", "/norm/")):
            return 1.0
        m = re.search(r"blocks/blocks_(\d+)/", name)
        if m and int(m.group(1)) + 1 >= first_unlocked_block:
            return 1.0
        return 0.0

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


def build_adamw(
    params,
    learning_rate: float | Callable,
    weight_decay: float = 0.05,
    betas: tuple[float, float] = (0.9, 0.95),
    layer_decay: float | None = None,
    num_blocks: int | None = None,
    clip_grad: float | None = None,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """AdamW matching the reference pretrain (betas 0.9/0.95) and finetune
    (layer decay 0.65) configurations.

    mu_dtype: storage dtype for the first moment (e.g. jnp.bfloat16) —
    halves the mu HBM traffic of the update step.  Default None keeps
    fp32 (the reference's torch Adam semantics); the second moment stays
    fp32 regardless (squares need the dynamic range)."""
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
