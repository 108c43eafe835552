"""Contrastive (COEM) training engine: CLIP losses, train/eval steps,
retrieval metrics.

Parity targets:
- ClipLoss with cross-device feature gather (open_clip/loss.py:148-229):
  under pjit the features are global arrays, so `img @ enf.T` over the
  batch-sharded axis IS the gathered-logits computation — XLA inserts the
  all-gather on ICI automatically, and it is differentiable by
  construction (replaces torch.distributed.nn.all_gather).
- ThreeModalityClipLoss (loss.py:232-388): 6 directed CE terms over 3
  pairs, masked by per-sample modality-presence weights; pairs with no
  valid samples contribute 0.
- Feature-cached gradient accumulation (train_retclip.py:131-168): no-grad
  feature pass over accumulation chunks, then per-chunk re-forward with
  the cached features of the other chunks as negatives.
- Retrieval metrics R@1/5/10, mean/median rank, both directions
  (train_retclip.py:409-425) + duplicate-corrected variant (:427-469).
- logit_scale clamp to ln(100) is enforced inside the model.
"""

from __future__ import annotations

import functools
import numpy as np
import jax
import jax.numpy as jnp

from .train_state import TrainState
from .mae_engine import optax_global_norm


def _ce_rows(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def clip_loss(img_feat: jnp.ndarray, enf_feat: jnp.ndarray,
              logit_scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric InfoNCE over the global batch."""
    n = img_feat.shape[0]
    logits = logit_scale * (img_feat.astype(jnp.float32)
                            @ enf_feat.astype(jnp.float32).T)
    labels = jnp.arange(n)
    return (_ce_rows(logits, labels).mean()
            + _ce_rows(logits.T, labels).mean()) / 2


def three_modality_clip_loss(img, enf1, enf2, scale, scale1, scale2,
                             w1, w2) -> jnp.ndarray:
    """6 directed CE terms masked by modality presence (loss.py:342-388).

    w1/w2: [N] float presence weights for enface1/enface2.  Pair scales
    follow the reference assignment: image-enf1 -> scale, image-enf2 ->
    scale1, enf1-enf2 -> scale2.
    """
    n = img.shape[0]
    labels = jnp.arange(n)
    img = img.astype(jnp.float32)
    enf1 = enf1.astype(jnp.float32)
    enf2 = enf2.astype(jnp.float32)

    def masked_pair(a, b, s, w):
        la = _ce_rows(s * a @ b.T, labels) * w
        lb = _ce_rows(s * b @ a.T, labels) * w
        tot = w.sum()
        safe = jnp.maximum(tot, 1.0)
        return (jnp.where(tot == 0, 0.0, la.sum() / safe),
                jnp.where(tot == 0, 0.0, lb.sum() / safe))

    l1a, l1b = masked_pair(img, enf1, scale, w1)
    l2a, l2b = masked_pair(img, enf2, scale1, w2)
    l3a, l3b = masked_pair(enf1, enf2, scale2, w1 * w2)
    return (l1a + l1b + l2a + l2b + l3a + l3b) / 6


# ------------------------------------------------------------- train steps

def _apply_partitioned(state: TrainState, tx, grads, trainable, frozen,
                       merge, new_rng):
    """Optimizer update over the trainable split only (real LiT locking,
    optim.make_partition): tx state/moments cover the trainable subtree,
    frozen params are merged back untouched."""
    import optax

    updates, new_opt = tx.update(grads, state.opt_state, trainable)
    new_tr = optax.apply_updates(trainable, updates)
    return state.replace(step=state.step + 1,
                         params=merge(new_tr, frozen),
                         opt_state=new_opt, rng=new_rng)


def make_clip_train_step(model, tx, three_mod: bool = False,
                         partition=None):
    """partition: optional (split, merge) from optim.make_partition —
    REAL LiT locking: grads/moments only exist for the trainable split
    and the frozen tower prefix has no backward pass."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        rng, new_rng = jax.random.split(state.rng)
        if partition is not None:
            trainable, frozen = partition[0](state.params)
        else:
            trainable, frozen = state.params, None

        def loss_fn(tr):
            params = partition[1](tr, frozen) if partition is not None else tr
            if three_mod:
                img, e1, e2, s0, s1, s2 = model.apply(
                    params, batch["image"], batch["enface1"],
                    batch["enface2"], deterministic=False,
                    rngs={"dropout": rng})
                return three_modality_clip_loss(
                    img, e1, e2, s0, s1, s2,
                    batch["weight1"], batch["weight2"])
            img, enf, scale = model.apply(
                params, batch["image"], batch["enface"], deterministic=False,
                rngs={"dropout": rng})
            return clip_loss(img, enf, scale)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        if partition is not None:
            state = _apply_partitioned(state, tx, grads, trainable, frozen,
                                       partition[1], new_rng)
        else:
            state = state.apply_gradients(tx, grads).replace(rng=new_rng)
        return state, {"loss": loss, "grad_norm": optax_global_norm(grads)}

    return step


def make_clip_accum_train_step(model, tx, accum_freq: int, partition=None):
    """Feature-cached gradient accumulation (the OpenCLIP algorithm,
    train_retclip.py:131-168): encode all chunks without grad, then for
    each chunk re-encode with grad and splice its features into the cached
    bank so every chunk sees the full effective batch as negatives.

    batch tensors have leading dim [accum_freq, chunk, ...].
    partition: optional (split, merge) for real LiT locking.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        rng, new_rng = jax.random.split(state.rng)
        if partition is not None:
            trainable, frozen = partition[0](state.params)
        else:
            trainable, frozen = state.params, None

        def encode(params, img, enf, r):
            return model.apply(params, img, enf, deterministic=False,
                               rngs={"dropout": r})

        rngs = jax.random.split(rng, accum_freq)
        # pass 1: cached features, no grad
        def enc_chunk(i):
            img, enf, _ = encode(state.params, batch["image"][i],
                                 batch["enface"][i], rngs[i])
            return img, enf

        cached_img, cached_enf = jax.lax.map(
            lambda i: enc_chunk(i), jnp.arange(accum_freq))

        def chunk_loss(tr, i):
            params = partition[1](tr, frozen) if partition is not None else tr
            img_i, enf_i, scale = encode(params, batch["image"][i],
                                         batch["enface"][i], rngs[i])
            img_all = jax.lax.dynamic_update_index_in_dim(
                cached_img, img_i, i, 0).reshape(-1, img_i.shape[-1])
            enf_all = jax.lax.dynamic_update_index_in_dim(
                cached_enf, enf_i, i, 0).reshape(-1, enf_i.shape[-1])
            return clip_loss(img_all, enf_all, scale)

        def accum(i, acc):
            grads, loss = acc
            l, g = jax.value_and_grad(chunk_loss)(trainable, i)
            return (jax.tree.map(jnp.add, grads, g), loss + l)

        zero = jax.tree.map(jnp.zeros_like, trainable)
        grads, loss = jax.lax.fori_loop(0, accum_freq, accum, (zero, 0.0))
        # Chunk grads are SUMMED, not averaged: each chunk loss already
        # spans the full effective batch, and each sample's grad flows
        # through exactly one chunk's re-forward, so the sum reconstructs
        # the full-batch gradient (reference train_retclip.py:131-168 does
        # one backward per chunk + a single optimizer.step).  The loss is
        # divided by accum_freq for logging only.
        if partition is not None:
            state = _apply_partitioned(state, tx, grads, trainable, frozen,
                                       partition[1], new_rng)
        else:
            state = state.apply_gradients(tx, grads).replace(rng=new_rng)
        return state, {"loss": loss / accum_freq,
                       "grad_norm": optax_global_norm(grads)}

    return step


def make_clip_accum_train_step_3mod(model, tx, accum_freq: int,
                                    partition=None):
    """3-modality feature-cached accumulation: modality-presence weights
    are stacked across chunks so each chunk's loss is masked over the
    full effective batch (train_retclip_3modalities.py:31-41).  Batch
    tensors have leading dims [accum_freq, chunk, ...].
    partition: optional (split, merge) for real LiT locking."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        rng, new_rng = jax.random.split(state.rng)
        rngs = jax.random.split(rng, accum_freq)
        w1 = batch["weight1"].reshape(-1)
        w2 = batch["weight2"].reshape(-1)
        if partition is not None:
            trainable, frozen = partition[0](state.params)
        else:
            trainable, frozen = state.params, None

        def encode(params, i, r):
            return model.apply(params, batch["image"][i],
                               batch["enface1"][i], batch["enface2"][i],
                               deterministic=False, rngs={"dropout": r})

        cached = jax.lax.map(
            lambda i: encode(state.params, i, rngs[i])[:3],
            jnp.arange(accum_freq))

        def chunk_loss(tr, i):
            params = partition[1](tr, frozen) if partition is not None else tr
            img_i, e1_i, e2_i, s0, s1, s2 = encode(params, i, rngs[i])
            full = [jax.lax.dynamic_update_index_in_dim(c, f, i, 0)
                    .reshape(-1, f.shape[-1])
                    for c, f in zip(cached, (img_i, e1_i, e2_i))]
            return three_modality_clip_loss(*full, s0, s1, s2, w1, w2)

        def accum(i, acc):
            grads, loss = acc
            l, g = jax.value_and_grad(chunk_loss)(trainable, i)
            return (jax.tree.map(jnp.add, grads, g), loss + l)

        zero = jax.tree.map(jnp.zeros_like, trainable)
        grads, loss = jax.lax.fori_loop(0, accum_freq, accum, (zero, 0.0))
        # summed, not averaged — each chunk loss spans the full effective
        # batch (see make_clip_accum_train_step)
        if partition is not None:
            state = _apply_partitioned(state, tx, grads, trainable, frozen,
                                       partition[1], new_rng)
        else:
            state = state.apply_gradients(tx, grads).replace(rng=new_rng)
        return state, {"loss": loss / accum_freq,
                       "grad_norm": optax_global_norm(grads)}

    return step


# ------------------------------------------- classification fine-tune steps

def make_clip_cls_train_step(model, tx, criterion, three_mod: bool = False,
                             single_modality: str | None = None,
                             partition=None):
    """Train step for the COEM classification fine-tune
    (train_retclip_finetune_more_cls_3mod.py train_one_epoch): towers +
    classification head, optional --single_modality ablation.  batch:
    {'image', 'enface' | 'enface1'+'enface2', 'label'}.
    partition: optional (split, merge) from optim.make_partition — LiT
    locking in the cls fine-tune too (the reference locks via
    model.lock_image_tower, main_retclip_finetune_more_cls_3mod.py:
    364-371); grads/moments cover only the trainable subtree."""
    sm = single_modality

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        rng, new_rng = jax.random.split(state.rng)
        if partition is not None:
            trainable, frozen = partition[0](state.params)
        else:
            trainable, frozen = state.params, None

        def loss_fn(tr):
            params = partition[1](tr, frozen) if partition is not None else tr
            if three_mod:
                out = model.apply(params, batch["image"], batch["enface1"],
                                  batch["enface2"], single_modality=sm,
                                  deterministic=False, rngs={"dropout": rng})
            else:
                out = model.apply(params, batch["image"], batch["enface"],
                                  single_modality=sm, deterministic=False,
                                  rngs={"dropout": rng})
            return criterion(out[0], batch["label"])

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        if partition is not None:
            state = _apply_partitioned(state, tx, grads, trainable, frozen,
                                       partition[1], new_rng)
        else:
            state = state.apply_gradients(tx, grads).replace(rng=new_rng)
        return state, {"loss": loss, "grad_norm": optax_global_norm(grads)}

    return step


def make_clip_cls_predict_step(model, three_mod: bool = False,
                               single_modality: str | None = None):
    sm = single_modality

    @jax.jit
    def predict(params, batch):
        if three_mod:
            out = model.apply(params, batch["image"], batch["enface1"],
                              batch["enface2"], single_modality=sm)
        else:
            out = model.apply(params, batch["image"], batch["enface"],
                              single_modality=sm)
        return out[0]

    return predict


def check_retclip_run_geometry(ckpt_path: str, vcfg, ecfg) -> None:
    """Refuse tower init from a retclip run whose recorded tower geometry
    (params.txt, written by cli.retclip) disagrees on head partitioning.

    Orbax tower tensors are shape-identical across head repartitionings
    (Wqkv stays [D, 3D]), so init_towers_from_retclip's structural
    leaf-count check cannot catch a num_heads mismatch — the model would
    load cleanly and silently compute the WRONG function (the same hazard
    class cli/export.py stamps .pth files for).  Runs without params.txt
    (or files predating the geometry fields) pass unchallenged."""
    import json
    import os

    run_dir = ckpt_path.rstrip("/")
    for _ in range(3):  # accept run dir, run/ckpt, or a step dir's parent
        if os.path.exists(os.path.join(run_dir, "params.txt")):
            break
        run_dir = os.path.dirname(run_dir)
    path = os.path.join(run_dir, "params.txt")
    if not os.path.exists(path):
        return
    try:
        with open(path) as f:
            saved = json.load(f)
    except ValueError:
        return
    for key, built in (("vision_cfg", vcfg), ("enface_cfg", ecfg)):
        rec = saved.get(key) or {}
        sh = rec.get("num_heads")
        bh = (built or {}).get("num_heads")
        if sh is not None and bh is not None and sh != bh:
            raise SystemExit(
                f"{ckpt_path} was trained with {key}.num_heads={sh} "
                f"(recorded in {path}), but this run builds the tower "
                f"with num_heads={bh}.  The tensors load cleanly either "
                "way and the model would silently compute the WRONG "
                "function — use a matching --model_config / flags.")


def init_towers_from_retclip(params, ckpt_path: str, step: int | None = None):
    """Initialize the classification model's towers from a TRAINED
    retclip checkpoint (the reference loads the contrastive state_dict
    into CustomTextCLIP(3Mod)Classification strict=False so only the
    classification head stays fresh,
    main_retclip_finetune_more_cls_3mod.py:452-470).

    ckpt_path: a cli.retclip output dir, its ckpt/ dir, or a specific
    step dir's parent.  Returns (new_params, n_copied_leaves)."""
    import os

    from ..core.checkpoint import restore_raw

    if os.path.isdir(os.path.join(ckpt_path, "ckpt")):
        ckpt_path = os.path.join(ckpt_path, "ckpt")
    raw, _ = restore_raw(ckpt_path, step)
    # raw is the retclip TrainState pytree: params live at raw['params']
    src = raw["params"]
    if "params" in src:
        src = src["params"]          # {'visual': ..., 'enface': ..., ...}
    dst = jax.tree.map(lambda x: x, params)  # shallow copy-on-write
    clip_tree = dst["params"]["clip"]
    copied = 0
    new_clip = dict(clip_tree)
    for key, sub in src.items():
        if key in new_clip:
            tmpl_leaves = jax.tree.leaves(new_clip[key])
            src_leaves = jax.tree.leaves(sub)
            if len(tmpl_leaves) != len(src_leaves):
                raise ValueError(
                    f"tower '{key}' structure mismatch between checkpoint "
                    "and model (different configs?)")
            new_clip[key] = jax.tree.map(
                lambda t, s: jnp.asarray(s, t.dtype), new_clip[key], sub)
            copied += len(src_leaves)
    dst = {**dst, "params": {**dst["params"], "clip": new_clip}}
    if copied == 0:
        raise ValueError(f"no tower params found in {ckpt_path}")
    return dst, copied


# --------------------------------------------------------------- retrieval

def retrieval_metrics(img_feat: np.ndarray, enf_feat: np.ndarray,
                      prefix_a: str = "image_to_enface",
                      prefix_b: str = "enface_to_image") -> dict:
    """R@1/5/10 + mean/median rank, both directions
    (train_retclip.py:409-425)."""
    logits = img_feat @ enf_feat.T
    out = {}
    for name, mat in ((prefix_a, logits), (prefix_b, logits.T)):
        n = mat.shape[0]
        order = np.argsort(-mat, axis=1)
        rank = np.argmax(order == np.arange(n)[:, None], axis=1)
        out[f"{name}_mean_rank"] = float(rank.mean() + 1)
        out[f"{name}_median_rank"] = float(np.floor(np.median(rank)) + 1)
        for k in (1, 5, 10):
            out[f"{name}_R@{k}"] = float((rank < k).mean())
    return out


def retrieval_metrics_dup_corrected(img_feat, enf_feat, group_ids) -> dict:
    """Duplicate-corrected retrieval (train_retclip.py:427-469): a
    retrieved item counts as correct if it belongs to the same group
    (e.g. same patient/eye) as the query."""
    group_ids = np.asarray(group_ids)
    logits = img_feat @ enf_feat.T
    out = {}
    for name, mat in (("image_to_enface", logits), ("enface_to_image", logits.T)):
        n = mat.shape[0]
        order = np.argsort(-mat, axis=1)
        same = group_ids[order] == group_ids[:, None]
        rank = np.argmax(same, axis=1)
        out[f"{name}_corrected_mean_rank"] = float(rank.mean() + 1)
        out[f"{name}_corrected_median_rank"] = float(np.floor(np.median(rank)) + 1)
        for k in (1, 5, 10):
            out[f"{name}_corrected_R@{k}"] = float((rank < k).mean())
    return out


def evaluate_retrieval(model, params, batches, three_mod: bool = False,
                       return_features: bool = False, encode_fn=None):
    """Concat features over a val loader and compute retrieval metrics
    (train_retclip.py:243-403).  For 3-mod, metrics for all 3 pairs
    (train_retclip_3modalities.py:371-392).  return_features=True also
    returns the concatenated feature bank — the payload the offline
    retrieval evaluator consumes (retrieval_results_{epoch}.pkl,
    train_retclip.py:373-395).

    encode_fn: optional encoder override with weights baked in —
    (img, enf) -> (img_feat, enf_feat) for 2-tower, (img, e1, e2) ->
    three features for 3-mod.  This is how a frozen AOT artifact or an
    int8-quantized encoder (compat/aot.py / --quant int8 on
    cli/retclip.py) serves the retrieval path; model/params are unused
    then."""
    feats: dict[str, list] = {}

    if three_mod:
        fwd = (jax.jit(lambda p, i, a, b: model.apply(p, i, a, b)[:3])
               if encode_fn is None else (lambda p, i, a, b:
                                          encode_fn(i, a, b)))
        for batch in batches:
            img, e1, e2 = fwd(params, batch["image"], batch["enface1"],
                              batch["enface2"])
            for k, v in (("image", img), ("enface1", e1), ("enface2", e2)):
                feats.setdefault(k, []).append(np.asarray(v))
        f = {k: np.concatenate(v) for k, v in feats.items()}
        out = {}
        out.update(retrieval_metrics(f["image"], f["enface1"],
                                     "image_to_enface1", "enface1_to_image"))
        out.update(retrieval_metrics(f["image"], f["enface2"],
                                     "image_to_enface2", "enface2_to_image"))
        out.update(retrieval_metrics(f["enface1"], f["enface2"],
                                     "enface1_to_enface2", "enface2_to_enface1"))
        return (out, f) if return_features else out

    fwd = (jax.jit(lambda p, i, e: model.apply(p, i, e)[:2])
           if encode_fn is None else (lambda p, i, e: encode_fn(i, e)))
    for batch in batches:
        img, enf = fwd(params, batch["image"], batch["enface"])
        feats.setdefault("image", []).append(np.asarray(img))
        feats.setdefault("enface", []).append(np.asarray(enf))
    f = {k: np.concatenate(v) for k, v in feats.items()}
    out = retrieval_metrics(f["image"], f["enface"])
    return (out, f) if return_features else out
