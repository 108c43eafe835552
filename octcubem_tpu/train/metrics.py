"""Evaluation metric battery (host-side numpy/sklearn, not on the hot path).

Parity targets: OCTCube/engine_finetune.py —
- misc_measures_multi_task (:86-242): per-disease (normal, disease) task
  metrics with per-sample validity masks,
- misc_measures_multi_label (:251-343),
- misc_measures over per-class confusion matrices (:346-382),
- regression metrics (:642-678): pearson r, R², explained variance, MSE,
  MAE.

Each returns {metric_name: {"classwise": [...], "macro": float}} so the
engines can write the same macro + per-class CSVs as the reference
(:708-765).
"""

from __future__ import annotations

import numpy as np

METRIC_NAMES = [
    "acc", "roc", "auprc", "precision", "recall", "f1", "max_f1", "AP",
    "balanced_acc", "specificity", "sensitivity", "mcc", "G", "kappa",
]


def _safe(fn, default=0.0):
    try:
        v = fn()
        if v is None or (isinstance(v, float) and not np.isfinite(v)):
            return default
        return v
    except Exception:
        return default


def binary_task_metrics(y_true: np.ndarray, score: np.ndarray,
                        threshold: float = 0.5) -> dict[str, float]:
    """All metrics for one binary task. y_true in {0,1}; score = P(positive)."""
    from sklearn.metrics import (
        accuracy_score, roc_auc_score, precision_score, recall_score,
        f1_score, average_precision_score, confusion_matrix,
        precision_recall_curve, auc, cohen_kappa_score,
    )

    pred = (score > threshold).astype(np.int64)
    eps = 1e-8
    cm = confusion_matrix(y_true, pred, labels=[0, 1])
    tn, fp, fn, tp = cm.ravel()
    sens = tp / (tp + fn + eps)
    spec = tn / (tn + fp + eps)
    prec = precision_score(y_true, pred, zero_division=0)
    rec = recall_score(y_true, pred, zero_division=0)
    out = {
        "acc": accuracy_score(y_true, pred),
        "roc": _safe(lambda: roc_auc_score(y_true, score), 0.5),
        "precision": prec,
        "recall": rec,
        "f1": f1_score(y_true, pred, zero_division=0),
        "AP": _safe(lambda: average_precision_score(y_true, score)),
        "balanced_acc": (sens + spec) / 2,
        "specificity": spec,
        "sensitivity": sens,
        "mcc": (tp * tn - fp * fn) / np.sqrt(
            (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) + eps),
        "G": np.sqrt(rec * spec),
        "kappa": _safe(lambda: cohen_kappa_score(y_true, pred)),
    }
    try:
        from sklearn.metrics import precision_recall_curve as prc, auc as _auc
        pr, re, _ = prc(y_true, score)
        out["auprc"] = _auc(re, pr)
        out["max_f1"] = float(np.max(2 * pr * re / (pr + re + eps)))
    except Exception:
        out["auprc"] = 0.0
        out["max_f1"] = 0.0
    return out


def multi_task_metrics(y_true: np.ndarray, y_pred: np.ndarray,
                       threshold: float = 0.5) -> dict:
    """y_true [B, C] multi-label (col 0 = normal); y_pred [B, 2*(C-1)]
    logits. Mirrors misc_measures_multi_task: per task keep only samples
    where (normal + disease) one-hot is valid, softmax over the pair, score
    = P(disease)."""
    num_tasks = y_true.shape[1] - 1
    logits = y_pred.reshape(y_pred.shape[0], num_tasks, 2).astype(np.float64)
    e = np.exp(logits - logits.max(axis=2, keepdims=True))
    prob = e / e.sum(axis=2, keepdims=True)

    per_task = {m: [] for m in METRIC_NAMES}
    included = []
    for i in range(num_tasks):
        t = np.stack([y_true[:, 0], y_true[:, i + 1]], axis=1)
        valid = t.sum(axis=1) > 0
        # tasks whose valid samples contain only one class are EXCLUDED
        # from the macro average (the reference skips them explicitly,
        # engine_finetune.py:86-242) — injecting 0.5/0.0 would silently
        # skew the macro; classwise keeps nan for positional CSV alignment
        if valid.sum() == 0 or len(np.unique(t[valid, 1])) < 2:
            for m in METRIC_NAMES:
                per_task[m].append(float("nan"))
            continue
        included.append(i)
        tm = binary_task_metrics(t[valid, 1], prob[valid, i, 1], threshold)
        for m in METRIC_NAMES:
            per_task[m].append(tm.get(m, 0.0))
    return {m: {"classwise": per_task[m],
                "macro": (float(np.nanmean(per_task[m])) if included
                          else 0.0)}
            for m in METRIC_NAMES}


def multi_label_metrics(y_true: np.ndarray, score: np.ndarray,
                        threshold: float = 0.5) -> dict:
    """y_true [B, C] in {0,1}; score [B, C] probabilities/sigmoid outputs."""
    per_cls = {m: [] for m in METRIC_NAMES}
    for i in range(y_true.shape[1]):
        tm = binary_task_metrics(y_true[:, i], score[:, i], threshold)
        for m in METRIC_NAMES:
            per_cls[m].append(tm.get(m, 0.0))
    return {m: {"classwise": per_cls[m], "macro": float(np.mean(per_cls[m]))}
            for m in METRIC_NAMES}


def multi_class_metrics(y_true: np.ndarray, prob: np.ndarray) -> dict:
    """y_true [B] int labels; prob [B, C] softmax probabilities.
    One-vs-rest confusion-matrix stats (misc_measures, :346-382) + AUC."""
    from sklearn.metrics import roc_auc_score, average_precision_score

    n_cls = prob.shape[1]
    pred = prob.argmax(axis=1)
    per_cls = {m: [] for m in METRIC_NAMES}
    for i in range(n_cls):
        t = (y_true == i).astype(np.int64)
        tm = binary_task_metrics(t, prob[:, i], 0.5)
        tm["acc"] = float(((pred == i) == (y_true == i)).mean())
        for m in METRIC_NAMES:
            per_cls[m].append(tm.get(m, 0.0))
    out = {m: {"classwise": per_cls[m], "macro": float(np.mean(per_cls[m]))}
           for m in METRIC_NAMES}
    out["overall_acc"] = float((pred == y_true).mean())
    out["macro_roc_ovr"] = _safe(
        lambda: roc_auc_score(y_true, prob, multi_class="ovr"), 0.5)
    return out


def regression_metrics(y_true: np.ndarray, y_pred: np.ndarray) -> dict:
    """Pearson r, R², explained variance, MSE, MAE
    (engine_finetune.py:642-678)."""
    from scipy.stats import pearsonr
    from sklearn.metrics import (
        r2_score, explained_variance_score, mean_squared_error,
        mean_absolute_error,
    )

    y_true = np.asarray(y_true).squeeze()
    y_pred = np.asarray(y_pred).squeeze()
    r = _safe(lambda: float(pearsonr(y_true, y_pred)[0]))
    return {
        "pearson_r": r,
        "r2": _safe(lambda: r2_score(y_true, y_pred)),
        "explained_variance": _safe(lambda: explained_variance_score(y_true, y_pred)),
        "mse": float(mean_squared_error(y_true, y_pred)),
        "mae": float(mean_absolute_error(y_true, y_pred)),
    }


def multi_output_regression_metrics(y_true: np.ndarray,
                                    y_pred: np.ndarray) -> dict:
    """Per-target regression battery for GA-growth labels: the reference
    tracks r2_k per label column where r2 = pearson(y_k, yhat_k)^2
    (main_retclip_finetune_more_cls_3mod.py:48-50 compute_r2, best-val
    tracking keyed on 'r2_{k}' at :104-126).  Also reports per-target
    MSE/MAE and macro means."""
    from scipy.stats import pearsonr

    y_true = np.asarray(y_true, np.float64)
    y_pred = np.asarray(y_pred, np.float64)
    if y_true.ndim == 1:
        y_true = y_true[:, None]
    if y_pred.ndim == 1:
        y_pred = y_pred[:, None]
    out = {}
    r2s = []
    for k in range(y_true.shape[1]):
        r = _safe(lambda: float(pearsonr(y_true[:, k], y_pred[:, k])[0]))
        out[f"r2_{k}"] = r * r
        out[f"pearson_r_{k}"] = r
        out[f"mse_{k}"] = float(np.mean((y_true[:, k] - y_pred[:, k]) ** 2))
        out[f"mae_{k}"] = float(np.mean(np.abs(y_true[:, k] - y_pred[:, k])))
        r2s.append(r * r)
    out["r2_macro"] = float(np.mean(r2s))
    out["mse_macro"] = float(np.mean(
        [out[f"mse_{k}"] for k in range(y_true.shape[1])]))
    return out


def compute_metrics(task_mode: str, y_true, y_pred, threshold=0.5) -> dict:
    """Dispatch mirroring evaluate()'s task-mode switch
    (engine_finetune.py:497-813)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if task_mode.startswith("multi_task"):
        return multi_task_metrics(y_true, y_pred, threshold)
    if task_mode == "multi_label":
        return multi_label_metrics(y_true, 1 / (1 + np.exp(-y_pred)), threshold)
    if task_mode == "regression":
        return regression_metrics(y_true, y_pred)
    if task_mode == "multi_output_regression":
        return multi_output_regression_metrics(y_true, y_pred)
    e = np.exp(y_pred - y_pred.max(axis=1, keepdims=True))
    return multi_class_metrics(y_true.astype(np.int64), e / e.sum(1, keepdims=True))
