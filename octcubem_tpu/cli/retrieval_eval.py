"""Offline retrieval evaluation: laterality prediction from top-k
neighbors + top-3 retrieval panels.

Parity target: retinal-COEM/src/retDisease_eval/evaluate_results_test_
train_visualize_all_models_top3_col_aireadi_laterality.py: load the
retrieval features dumped by the retclip engine, predict each OCT
volume's laterality by majority vote over its top-k retrieved enface
images, report accuracy, and render top-3 retrieval panels.
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def laterality_from_topk(img_feat: np.ndarray, enf_feat: np.ndarray,
                         enf_laterality: np.ndarray, k: int = 3) -> np.ndarray:
    """Predicted laterality per query by majority vote of top-k retrieved
    enface images (0 = OD, 1 = OS)."""
    logits = img_feat @ enf_feat.T
    topk = np.argsort(-logits, axis=1)[:, :k]
    votes = enf_laterality[topk]
    return (votes.mean(axis=1) > 0.5).astype(np.int64)


def evaluate_laterality(img_feat, enf_feat, img_laterality, enf_laterality,
                        ks=(1, 3, 5)) -> dict:
    out = {}
    img_laterality = np.asarray(img_laterality)
    for k in ks:
        pred = laterality_from_topk(img_feat, enf_feat,
                                    np.asarray(enf_laterality), k)
        out[f"laterality_acc@top{k}"] = float((pred == img_laterality).mean())
    return out


def top3_panels(img_feat, enf_feat, n_queries: int = 8) -> np.ndarray:
    """Indices [n_queries, 3] of the top-3 retrieved enface items for the
    first n_queries OCT queries (panel rendering is delegated to the
    caller, which owns the image data)."""
    logits = img_feat[:n_queries] @ enf_feat.T
    return np.argsort(-logits, axis=1)[:, :3]


def main(argv=None):
    parser = argparse.ArgumentParser("retrieval laterality evaluation")
    parser.add_argument("features_pkl",
                        help="pickle with {'image': [N,D], 'enface': [N,D], "
                             "'image_laterality': [N], 'enface_laterality': [N]}")
    parser.add_argument("--topk", type=int, nargs="+", default=[1, 3, 5])
    args = parser.parse_args(argv)
    with open(args.features_pkl, "rb") as f:
        d = pickle.load(f)
    metrics = evaluate_laterality(
        np.asarray(d["image"]), np.asarray(d["enface"]),
        d["image_laterality"], d["enface_laterality"], ks=tuple(args.topk))
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}")
    return metrics


if __name__ == "__main__":
    main()
