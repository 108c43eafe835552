"""MAE reconstruction visualization.

Parity target: Pre-training/custom_util/misc.py:909-1303
(get_visible_images / get_patch_embed_images / show_image): unpatchify the
decoder prediction, paste the visible (unmasked) patches from the input,
and save PNG grids during pretraining eval (engine_pretrain.py:282-338).
"""

from __future__ import annotations

import os

import numpy as np

from ..ops.patchify import unpatchify_3d


def reconstruction_panels(imgs: np.ndarray, pred_tokens: np.ndarray,
                          mask: np.ndarray, t_patch: int, patch: int,
                          grid: tuple[int, int, int]):
    """Build (original, masked-input, reconstruction, paste) volumes.

    imgs: [B, T, H, W, C]; pred_tokens: [B, L, u*p*p*C]; mask: [B, L]
    (1 = masked).  Returns four [B, T, H, W, C] arrays.
    """
    import jax.numpy as jnp

    b, l = mask.shape
    c = imgs.shape[-1]
    recon = np.asarray(unpatchify_3d(jnp.asarray(pred_tokens), t_patch,
                                     patch, grid, c))
    # expand token mask to pixels: kron of [B, g0, g1, g2] with a
    # [t_patch, patch, patch] block of ones yields the interleaved
    # [B, g0*t_patch, g1*patch, g2*patch] = [B, T, H, W] pixel mask
    # directly (each token's value tiled over its tube)
    mask_px = np.kron(mask.reshape(b, *grid).astype(np.float64),
                      np.ones((t_patch, patch, patch)))[..., None]
    imgs = np.asarray(imgs)
    masked_input = imgs * (1 - mask_px)
    pasted = imgs * (1 - mask_px) + recon * mask_px
    return imgs, masked_input, recon, pasted


def save_confusion_matrix(y_true, y_pred, class_names, out_path: str):
    """Confusion-matrix image, the matplotlib equivalent of the
    reference's pycm JPEG dumps (engine_finetune.py:766-776)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(class_names)
    cm = np.zeros((n, n), np.int64)
    for t, p in zip(np.asarray(y_true), np.asarray(y_pred)):
        cm[int(t), int(p)] += 1
    fig, ax = plt.subplots(figsize=(1 + 0.6 * n, 1 + 0.6 * n))
    ax.imshow(cm, cmap="Blues")
    ax.set_xticks(range(n), class_names, rotation=45, ha="right", fontsize=7)
    ax.set_yticks(range(n), class_names, fontsize=7)
    for i in range(n):
        for j in range(n):
            ax.text(j, i, str(cm[i, j]), ha="center", va="center", fontsize=7)
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return cm


def save_recon_grid(panels, out_dir: str, tag: str, frame_stride: int = 10):
    """Save a PNG grid: rows = (orig, masked, recon, pasted), cols =
    sampled frames. Uses matplotlib (available in this environment)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    orig, masked, recon, pasted = [p[0, ..., 0] for p in panels]
    frames = list(range(0, orig.shape[0], frame_stride)) or [0]
    fig, axes = plt.subplots(4, len(frames),
                             figsize=(2 * len(frames), 8), squeeze=False)
    for col, fidx in enumerate(frames):
        for row, (vol, name) in enumerate(
                [(orig, "original"), (masked, "masked"),
                 (recon, "recon"), (pasted, "recon+visible")]):
            ax = axes[row][col]
            ax.imshow(vol[fidx], cmap="gray")
            ax.axis("off")
            if col == 0:
                ax.set_title(name, fontsize=8, loc="left")
    path = os.path.join(out_dir, f"recon_{tag}.png")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path
