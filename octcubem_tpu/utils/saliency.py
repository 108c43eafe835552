"""Grad-CAM saliency for ViT towers (classifier or COEM contrastive).

Parity target: retinal-COEM/src/oph_vis_util/base_cam_retclip_3mod.py
(pytorch-grad-cam BaseCAM adapted to the 3-mod CLIP) plus the *_gradcam
tower duplicates (model.py:812-897).  The torch version needs forward/
backward hooks and a duplicated enface tower to separate per-modality
gradients; in JAX the activation gradients come from flax's perturbation
mechanism: models built with ``capture_cam=True`` insert zero-valued
variables after every block, and ``jax.grad`` w.r.t. the 'perturbations'
collection yields exactly dScore/dActivation — one tower serves every
modality.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


def gradcam(model, params, x, score_fn: Callable | None = None,
            class_idx: int | None = None, layer: int = -1,
            model_kwargs: dict | None = None,
            grid: tuple[int, ...] | None = None) -> np.ndarray:
    """Grad-CAM token saliency.

    model: a module constructed with capture_cam=True (vit_st / vit2d /
      COEM towers via their trunk flags).
    params: full variables dict from model.init (must contain the
      'perturbations' collection; init once with capture_cam=True).
    score_fn(output) -> scalar; default: sum of logits[:, class_idx]
      (or the max-logit class).
    layer: which block's activations to use (-1 = last).
    grid: optional (t, h, w) / (h, w) to reshape the token map.

    Returns [B, L] (or [B, *grid]) saliency in [0, 1].
    """
    kwargs = model_kwargs or {}
    pert0 = params["perturbations"]
    rest = {k: v for k, v in params.items() if k != "perturbations"}

    def forward(pert):
        out = model.apply({**rest, "perturbations": pert}, x, **kwargs)
        if isinstance(out, tuple):
            out = out[0]
        return out

    logits = forward(pert0)
    if score_fn is None:
        ci = class_idx
        if ci is None:
            ci = int(jnp.argmax(logits.sum(axis=0)))
        score_fn = lambda lg: lg[:, ci].sum()

    grads = jax.grad(lambda p: score_fn(forward(p)))(pert0)

    # activations sown at the same points the perturbations inject
    _, inter = model.apply(rest, x, **kwargs, mutable=["intermediates"])

    def find_keys(tree, tag, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(find_keys(v, tag, prefix + (k,)))
            elif tag in k:
                out[prefix + (k,)] = v
        return out

    flat_g = find_keys(grads, "cam_")
    cam_keys = sorted(flat_g, key=lambda k: int(k[-1].split("_")[-1]))
    key = cam_keys[layer]
    g = flat_g[key]  # [B, N, D] = dScore/dActivation

    idx = key[-1].split("_")[-1]
    flat_a = find_keys(inter["intermediates"], f"cam_act_{idx}")
    a = next(iter(flat_a.values()))
    if isinstance(a, tuple):
        a = a[0]

    # Grad-CAM: channel weights = token-mean of grads; cam = ReLU(A @ w)
    w = g.astype(jnp.float32).mean(axis=1, keepdims=True)     # [B, 1, D]
    cam = jnp.maximum((a.astype(jnp.float32) * w).sum(-1), 0)  # [B, N]

    # drop cls token if present (token count = 1 + grid product)
    if grid is not None:
        l = int(np.prod(grid))
        if cam.shape[1] == l + 1:
            cam = cam[:, 1:]
        cam = cam.reshape((cam.shape[0],) + tuple(grid))
    cam = cam / (cam.max(axis=tuple(range(1, cam.ndim)), keepdims=True) + 1e-8)
    return np.asarray(cam)


def clip_pair_gradcam(model, params, image, enface, target: str = "image",
                      layer: int = -1, grid=None) -> np.ndarray:
    """Saliency of the CLIP pair similarity w.r.t. one tower's blocks —
    the retclip use-case: which OCT/enface regions drive the match
    (base_cam_retclip_3mod.py:21-303)."""
    pert0 = params["perturbations"]
    rest = {k: v for k, v in params.items() if k != "perturbations"}

    def sim(pert):
        img_f, enf_f, _ = model.apply({**rest, "perturbations": pert},
                                      image, enface)
        return (img_f * enf_f).sum()

    grads = jax.grad(sim)(pert0)

    def flatten(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flatten(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = v
        return out

    flat = flatten(grads)
    tower = "visual" if target == "image" else "enface"
    keys = sorted([k for k in flat if tower in k[0] and "cam_" in k[-1]],
                  key=lambda k: int(k[-1].split("_")[-1]))
    g = flat[keys[layer]]
    cam = jnp.linalg.norm(g.astype(jnp.float32), axis=-1)
    if grid is not None:
        l = int(np.prod(grid))
        if cam.shape[1] == l + 1:
            cam = cam[:, 1:]
        cam = cam.reshape((cam.shape[0],) + tuple(grid))
    cam = cam / (cam.max(axis=tuple(range(1, cam.ndim)), keepdims=True) + 1e-8)
    return np.asarray(cam)
