"""Paired multimodal dataset: OCT volume <-> en face IR / FAF.

Parity target: retinal-COEM/src/training/multimodal_dataset.py
(OphthalDataset, 1549 LoC): the reference enumerates 13 mode combinations
over OCT3D / paired-IR / FAF / standalone-IR; here one dataset covers
them via modality presence flags, matching custom_collate_fn's
(data_dict, (names, modality_flags)) contract (:319-362).

Directory layout per eye/visit:
    root/patient/visit/
        oct_000.png ...            (or volume.npy / scan.dcm)
        ir.png                     (en face infrared)
        faf.png                    (fundus autofluorescence, optional)
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Callable

import numpy as np

from . import ingest
from .patients import Visit, scan_directory


@dataclasses.dataclass
class PairedRecord:
    visit: Visit
    ir_path: str | None
    faf_path: str | None


def scan_paired_directory(root: str, frame_glob: str = "oct_*.png",
                          ir_name: str = "ir.png",
                          faf_name: str = "faf.png") -> list[PairedRecord]:
    records = []
    for v in scan_directory(root, frame_glob):
        base = os.path.dirname(v.frames[0])
        ir = os.path.join(base, ir_name)
        faf = os.path.join(base, faf_name)
        records.append(PairedRecord(
            v, ir if os.path.exists(ir) else None,
            faf if os.path.exists(faf) else None))
    return records


def _load_enface(path: str, size: int) -> np.ndarray:
    from PIL import Image

    from .np_resize import resize_bilinear_np

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    img = resize_bilinear_np(np.moveaxis(img, -1, 0), (size, size))
    return np.ascontiguousarray(np.moveaxis(img, 0, -1))


@dataclasses.dataclass
class PairedOCTEnfaceDataset:
    """Yields {'image', 'enface1', 'enface2', 'weight1', 'weight2',
    '__key__'} samples; missing modalities are zero-filled with weight 0
    (the 3-mod loss masks them, clip_engine.three_modality_clip_loss)."""

    records: list[PairedRecord]
    num_frames: int = 60
    oct_size: int = 256
    enface_size: int = 384
    oct_transform: Callable | None = None
    require_ir: bool = True
    labels_fn: Callable | None = None

    def __post_init__(self):
        if self.require_ir:
            self.records = [r for r in self.records if r.ir_path is not None]

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        r = self.records[i]
        v = r.visit
        if v.frames[0].endswith(".npy"):
            vol = ingest.load_npy_volume(v.frames[0])
        elif v.frames[0].endswith(".dcm"):
            vol, _, _ = ingest.load_dicom_volume(v.frames[0])
        else:
            vol = ingest.load_frame_stack(v.frames)
        vol = ingest.pad_or_crop_frames(vol, self.num_frames)
        if self.oct_transform is not None:
            vol = self.oct_transform(vol, rng=np.random.default_rng(i))
        else:
            from .np_resize import resize_trilinear_np
            vol = resize_trilinear_np(
                vol, (self.num_frames, self.oct_size, self.oct_size))
        sample = {
            "image": vol[..., None].astype(np.float32),
            "__key__": f"{v.patient_id}/{v.visit_id}",
        }
        es = self.enface_size
        if r.ir_path is not None:
            sample["enface1"] = _load_enface(r.ir_path, es)
            sample["weight1"] = np.float32(1.0)
        else:
            sample["enface1"] = np.zeros((es, es, 3), np.float32)
            sample["weight1"] = np.float32(0.0)
        if r.faf_path is not None:
            sample["enface2"] = _load_enface(r.faf_path, es)
            sample["weight2"] = np.float32(1.0)
        else:
            sample["enface2"] = np.zeros((es, es, 3), np.float32)
            sample["weight2"] = np.float32(0.0)
        if self.labels_fn is not None:
            sample["label"] = self.labels_fn(v)
        return sample


def collate_paired(samples: list[dict]) -> tuple[dict, list[str]]:
    """Batch dict + keys, the custom_collate_fn contract
    (multimodal_dataset.py:319-362)."""
    keys = [s["__key__"] for s in samples]
    batch = {k: np.stack([s[k] for s in samples])
             for k in samples[0] if k != "__key__"}
    return batch, keys
