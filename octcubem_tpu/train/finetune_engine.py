"""Fine-tune engine: jitted train/eval steps + host-side epoch orchestration.

Parity target: OCTCube/engine_finetune.py:386-494 (train_one_epoch with
per-iteration cosine LR, loss dispatch, NaN handling) and the best-model
tracking loop of main_finetune_downstream_inhouse_singlefold.py:640-780
(val-AUC best with AUPRC tie-breaker, test at new best, early stopping,
NaN -> halve LR).

TPU-native differences: AMP fp16 + GradScaler is replaced by bf16
activations; DDP by batch sharding under jit; the per-iteration LR lives
inside the optax schedule instead of mutating optimizer param groups.
"""

from __future__ import annotations

import dataclasses
import os
import functools
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from .train_state import TrainState
from .mae_engine import optax_global_norm
from . import metrics as metrics_lib


def make_finetune_train_step(model, tx, criterion: Callable):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, targets):
        rng, new_rng = jax.random.split(state.rng)

        def loss_fn(params):
            out = model.apply(params, batch, deterministic=False,
                              rngs={"dropout": rng})
            if isinstance(out, tuple):
                out = out[0]
            return criterion(out, targets)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(tx, grads)
        # NaN guard (reference returns None -> caller halves LR,
        # engine_finetune.py:447-449): keep old params/opt_state if the
        # loss is non-finite — but always advance the rng, so the retry
        # step doesn't reuse the identical dropout mask.
        ok = jnp.isfinite(loss)
        new_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_state, state)
        new_state = new_state.replace(rng=new_rng)
        return new_state, {"loss": loss, "grad_norm": optax_global_norm(grads),
                           "finite": ok}

    return step


def make_predict_step(model):
    @jax.jit
    def predict(params, batch):
        out = model.apply(params, batch)
        if isinstance(out, tuple):
            out = out[0]
        return out

    return predict


@dataclasses.dataclass
class BestTracker:
    """Val-best tracking with the reference's tie-breakers
    (main_finetune…singlefold.py:695-780): primary val AUROC (macro),
    tie-break on AUPRC; test is evaluated at each new val best; early stop
    after `patience` epochs without improvement."""

    patience: int | None = None
    best_auc: float = -1.0
    best_auprc: float = -1.0
    best_epoch: int = -1
    epochs_since_best: int = 0
    best_val_metrics: dict | None = None
    best_test_metrics: dict | None = None

    def update(self, epoch: int, val_metrics: dict) -> bool:
        """Returns True if this epoch is a new best (caller should save a
        checkpoint and run the test split).

        Classification runs rank on (AUROC, AUPRC); regression runs rank on
        (pearson r, -MSE) — the reference regression mains track pearson
        (engine_finetune.py:642-678)."""
        if "pearson_r" in val_metrics:  # regression task mode
            auc = val_metrics.get("pearson_r", 0.0)
            auprc = -val_metrics.get("mse", float("inf"))
        else:
            auc = val_metrics.get("roc", {}).get("macro", 0.0)
            auprc = val_metrics.get("auprc", {}).get("macro", 0.0)
        improved = (auc > self.best_auc) or (
            auc == self.best_auc and auprc > self.best_auprc)
        if improved:
            self.best_auc, self.best_auprc = auc, auprc
            self.best_epoch = epoch
            self.epochs_since_best = 0
            self.best_val_metrics = val_metrics
        else:
            self.epochs_since_best += 1
        return improved

    @property
    def should_stop(self) -> bool:
        return (self.patience is not None
                and self.epochs_since_best >= self.patience)


def evaluate(predict_step, params, batches, task_mode: str,
             threshold: float = 0.5) -> tuple[dict, np.ndarray, np.ndarray]:
    """Run prediction over an iterable of (batch, target) pairs and compute
    the reference metric battery. Returns (metrics, y_true, y_pred)."""
    preds, trues = [], []
    for batch, target in batches:
        out = predict_step(params, batch)
        # bf16 model outputs -> float32: numpy's ml_dtypes bfloat16 is not
        # a dtype scipy/sklearn accept (pearsonr raises on it)
        preds.append(np.asarray(out).astype(np.float32))
        trues.append(np.asarray(target))
    y_pred = np.concatenate(preds, axis=0)
    y_true = np.concatenate(trues, axis=0)
    return metrics_lib.compute_metrics(task_mode, y_true, y_pred, threshold), \
        y_true, y_pred


def dump_frame_inference(out_dir: str, mode: str, names, y_true, y_pred,
                         embeddings=None) -> str:
    """Per-sample inference dump to pkl (engine_finetune.py:680-688's
    optional per-frame inference results)."""
    import pickle

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"frame_inference_{mode}.pkl")
    payload = {"names": list(names), "y_true": np.asarray(y_true),
               "y_pred": np.asarray(y_pred)}
    if embeddings is not None:
        payload["embeddings"] = np.asarray(embeddings)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def write_confusion_matrices(y_true, y_pred, task_mode: str, out_dir: str,
                             mode: str,
                             class_names: list[str] | None = None) -> list:
    """Per-eval confusion-matrix images (the reference writes pycm JPEGs
    at engine_finetune.py:766-776,805-808): one C x C matrix for
    multi-class; per-task/per-class 2x2 matrices for multi-task /
    multi-label; none for regression.  Returns the written paths."""
    from ..utils.visualization import save_confusion_matrix

    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    paths = []
    if task_mode == "regression":
        return paths
    if task_mode.startswith("multi_task"):
        num_tasks = y_true.shape[1] - 1
        logits = y_pred.reshape(y_pred.shape[0], num_tasks, 2)
        for i in range(num_tasks):
            t = np.stack([y_true[:, 0], y_true[:, i + 1]], axis=1)
            valid = t.sum(axis=1) > 0
            if valid.sum() == 0:
                continue
            name = class_names[i] if class_names else str(i)
            p = os.path.join(out_dir, f"confusion_{mode}_task{i}_{name}.png")
            save_confusion_matrix(t[valid, 1],
                                  logits[valid, i].argmax(axis=1),
                                  ["normal", name], p)
            paths.append(p)
        return paths
    if task_mode == "multi_label":
        pred = (y_pred > 0).astype(np.int64)  # logits: sigmoid > 0.5
        for i in range(y_true.shape[1]):
            name = class_names[i] if class_names else str(i)
            p = os.path.join(out_dir, f"confusion_{mode}_class{i}_{name}.png")
            save_confusion_matrix(y_true[:, i], pred[:, i],
                                  ["neg", name], p)
            paths.append(p)
        return paths
    n_cls = y_pred.shape[1]
    names = class_names or [str(i) for i in range(n_cls)]
    p = os.path.join(out_dir, f"confusion_{mode}.png")
    save_confusion_matrix(y_true.astype(np.int64), y_pred.argmax(axis=1),
                          names[:n_cls], p)
    paths.append(p)
    return paths


def write_metric_csvs(metrics: dict, out_dir: str, mode: str,
                      class_names: list[str] | None = None) -> None:
    """macro_metrics_{mode}.csv + per-class CSVs, mirroring
    engine_finetune.py:708-765."""
    import csv
    import os

    os.makedirs(out_dir, exist_ok=True)
    scalar = {k: v for k, v in metrics.items() if isinstance(v, float)}
    macro = {k: v["macro"] for k, v in metrics.items()
             if isinstance(v, dict) and "macro" in v}
    with open(os.path.join(out_dir, f"macro_metrics_{mode}.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        keys = list(macro) + list(scalar)
        w.writerow(keys)
        w.writerow([macro.get(k, scalar.get(k)) for k in keys])
    n_cls = 0
    for v in metrics.values():
        if isinstance(v, dict) and "classwise" in v:
            n_cls = len(v["classwise"])
            break
    for i in range(n_cls):
        name = class_names[i] if class_names else str(i)
        with open(os.path.join(out_dir, f"class_{i}_{name}_metrics_{mode}.csv"),
                  "w", newline="") as f:
            w = csv.writer(f)
            keys = [k for k, v in metrics.items()
                    if isinstance(v, dict) and "classwise" in v]
            w.writerow(keys)
            w.writerow([metrics[k]["classwise"][i] for k in keys])
