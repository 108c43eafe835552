"""Self-paced learning (SPL) state for the joint 2D branch.

Parity target: Pre-training/custom_util/PatientDataset_pretrain.py:126-146
(all_image_dict hardness tracking, init_spl/update_spl top-K% selection)
and the per-epoch pickle checkpointing of the dict
(main_pretrain…py:469-489,660-687).
"""

from __future__ import annotations

import os
import pickle

import numpy as np


class SPLState:
    """Tracks per-image hardness (MSE) and selects the top-K% hardest for
    the next epoch's 2D dataset."""

    def __init__(self, image_names: list[str]):
        self.hardness = {name: {"hardness": 0.0, "mse_loss": 0.0, "visited": 0}
                         for name in image_names}
        self.active: list[str] = list(image_names)

    def update_hardness(self, names: list[str], losses) -> None:
        """Write per-frame MSE back (engine_pretrain.py:133-146)."""
        for n, l in zip(names, np.asarray(losses).ravel()):
            if n in self.hardness:
                e = self.hardness[n]
                e["mse_loss"] = float(l)
                e["hardness"] = float(l)
                e["visited"] += 1

    def update_spl(self, k: float) -> list[str]:
        """Keep the top-K fraction hardest images
        (PatientDataset_pretrain.py:126-146). Returns the active list."""
        items = sorted(self.hardness.items(),
                       key=lambda kv: kv[1]["hardness"], reverse=True)
        n_keep = max(1, int(len(items) * k))
        self.active = [name for name, _ in items[:n_keep]]
        return self.active

    def save(self, out_dir: str, epoch: int) -> str:
        path = os.path.join(out_dir, f"all_image_dict-{epoch}.pkl")
        with open(path, "wb") as f:
            pickle.dump(self.hardness, f)
        return path

    def subset(self, dataset) -> "SPLSubset":
        """View of `dataset` restricted to the currently active (top-K
        hardest) images — the per-epoch 2D dataloader rebuild
        (main_pretrain…py:673-687)."""
        return SPLSubset(dataset, self)

    @classmethod
    def load(cls, path: str) -> "SPLState":
        with open(path, "rb") as f:
            d = pickle.load(f)
        obj = cls([])
        obj.hardness = d
        obj.active = list(d.keys())
        return obj


class SPLSubset:
    """Name-indexed subset of a (sample, name) dataset following the SPL
    active list.  The view is live: update_spl() changes what it serves."""

    def __init__(self, dataset, state: SPLState):
        self.dataset = dataset
        self.state = state
        self._index = {name: i for i, name in enumerate(dataset.names)}

    def __len__(self):
        return len(self.state.active)

    def __getitem__(self, i):
        return self.dataset[self._index[self.state.active[i]]]
