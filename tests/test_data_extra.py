import os
import zlib

import numpy as np

from octcubem_tpu.data import ingest, patients
from octcubem_tpu.utils.visualization import save_confusion_matrix


def test_load_inhouse_metadata(tmp_path):
    """Schema-aware metadata ingestion (PatientDataset_inhouse.py:160-290):
    patient->visit-hash pkl + binary txt id lists + multilabel json."""
    import json
    import pickle

    from octcubem_tpu.data.patients import (load_inhouse_metadata,
                                            build_labels)

    md = tmp_path / "meta"
    lists = md / "multi_cls_expr_10x_0315"
    lists.mkdir(parents=True)
    patient_dict = {"p1": ["hashA", "hashB"], "p2": ["hashC"],
                    "p3": ["hashD"]}
    with open(md / "patient_dict_w_metadata_first_visit_from_ir.pkl",
              "wb") as f:
        pickle.dump(patient_dict, f)
    (lists / "AMD_w_disease.txt").write_text("p1\np2\n")
    (lists / "AMD_wo_disease.txt").write_text("p3\n")
    with open(lists / "multilabel_cls_dict.json", "w") as f:
        json.dump({"disease_list": ["AMD", "DME"],
                   "patient_dict": {"p2": [0, 1], "p1": [1, 0],
                                    "p3": [0, 0]}}, f)

    visits, classes = load_inhouse_metadata(str(md), "binary_cls", "AMD",
                                            num_frames=3)
    assert classes == ["NC", "AMD"]
    # visit-index expansion: p1 has two visits, in patient order
    assert [(v.patient_id, v.visit_id) for v in visits] == [
        ("p1", "hashA"), ("p1", "hashB"), ("p2", "hashC"), ("p3", "hashD")]
    assert visits[0].labels == {"AMD": 1} and visits[3].labels == {"AMD": 0}
    assert visits[0].frames == [f"p1/macOCT/hashA/oct-{i:03d}.png"
                                for i in range(3)]

    visits, dl = load_inhouse_metadata(str(md), "multi_label")
    assert dl == ["AMD", "DME"]
    assert visits[0].patient_id == "p1"  # json dict sorted by patient id
    _, label_fn = build_labels(visits, "multi_label", disease_list=dl)
    np.testing.assert_array_equal(label_fn(visits[0]), [0, 1, 0])
    np.testing.assert_array_equal(label_fn(visits[-1]), [1, 0, 0])


def test_mhd_reader_local_and_compressed(tmp_path):
    rng = np.random.default_rng(0)
    vol = (rng.random((4, 6, 8)) * 255).astype(np.uint8)  # z, y, x
    # uncompressed LOCAL
    hdr = (b"ObjectType = Image\nNDims = 3\nDimSize = 8 6 4\n"
           b"ElementType = MET_UCHAR\nElementDataFile = LOCAL\n")
    p1 = tmp_path / "a.mhd"
    p1.write_bytes(hdr + vol.tobytes())
    out = ingest.load_mhd_volume(str(p1))
    np.testing.assert_array_equal(out, vol.astype(np.float32))
    # compressed external raw
    raw = zlib.compress(vol.tobytes())
    (tmp_path / "b.zraw").write_bytes(raw)
    hdr2 = (b"ObjectType = Image\nNDims = 3\nDimSize = 8 6 4\n"
            b"ElementType = MET_UCHAR\nCompressedData = True\n"
            b"ElementDataFile = b.zraw\n")
    p2 = tmp_path / "b.mhd"
    p2.write_bytes(hdr2)
    out2 = ingest.load_mhd_volume(str(p2))
    np.testing.assert_array_equal(out2, vol.astype(np.float32))


def test_imagefolder(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    for cls in ("CNV", "NORMAL"):
        os.makedirs(tmp_path / cls)
        for i in range(3):
            Image.fromarray((rng.random((16, 16)) * 255).astype(np.uint8)).save(
                tmp_path / cls / f"{i}.png")
    ds = patients.ImageFolderDataset(str(tmp_path), mode="gray")
    assert len(ds) == 6
    assert ds.classes == ["CNV", "NORMAL"]
    img, y = ds[0]
    assert img.shape == (16, 16, 1) and y == 0
    img, y = ds[5]
    assert y == 1


def test_few_shot_subsample():
    visits = []
    for i in range(20):
        v = patients.Visit(f"p{i}", "0", ["x"])
        v.labels = {"AMD": int(i < 12)}
        visits.append(v)
    _, label_fn = patients.build_labels(visits, "binary_cls", disease="AMD")
    sub = few = patients.few_shot_subsample(visits, 3, label_fn, seed=1)
    labels = [int(label_fn(v)) for v in sub]
    assert labels.count(0) == 3 and labels.count(1) == 3


def test_confusion_matrix_plot(tmp_path):
    y_true = [0, 0, 1, 1, 2]
    y_pred = [0, 1, 1, 1, 2]
    cm = save_confusion_matrix(y_true, y_pred, ["a", "b", "c"],
                               str(tmp_path / "cm.jpg"))
    assert cm[0, 0] == 1 and cm[0, 1] == 1 and cm[1, 1] == 2 and cm[2, 2] == 1
    assert os.path.exists(tmp_path / "cm.jpg")


def test_paired_multimodal_dataset(tmp_path):
    from PIL import Image
    from octcubem_tpu.data.multimodal import (
        PairedOCTEnfaceDataset, scan_paired_directory, collate_paired)
    rng = np.random.default_rng(0)
    for p in range(3):
        d = tmp_path / f"p{p}" / "v0"
        os.makedirs(d)
        for f in range(4):
            Image.fromarray((rng.random((32, 32)) * 255).astype(np.uint8)).save(
                d / f"oct_{f:03d}.png")
        Image.fromarray((rng.random((24, 24, 3)) * 255).astype(np.uint8)).save(
            d / "ir.png")
        if p == 0:
            Image.fromarray((rng.random((24, 24, 3)) * 255).astype(np.uint8)).save(
                d / "faf.png")
    recs = scan_paired_directory(str(tmp_path))
    ds = PairedOCTEnfaceDataset(recs, num_frames=4, oct_size=16, enface_size=16)
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (4, 16, 16, 1)
    assert s["enface1"].shape == (16, 16, 3)
    assert s["weight1"] == 1.0
    weights2 = sorted(float(ds[i]["weight2"]) for i in range(3))
    assert weights2 == [0.0, 0.0, 1.0]  # only p0 has FAF
    batch, keys = collate_paired([ds[0], ds[1]])
    assert batch["image"].shape[0] == 2 and len(keys) == 2


def test_multimodal_modes_and_convert_hw_shape(tmp_path):
    """Mode semantics (MODE_MAPPING, multimodal_dataset.py:661-675) and
    aspect-aware shape normalization (convert_hw_shape, :381-442)."""
    from PIL import Image
    from octcubem_tpu.data.multimodal import (
        PairedOCTEnfaceDataset, scan_paired_directory, convert_hw_shape)

    rng = np.random.default_rng(0)
    for p in range(3):
        d = tmp_path / f"p{p}" / "v0"
        os.makedirs(d)
        for f in range(4):
            Image.fromarray((rng.random((32, 32)) * 255).astype(
                np.uint8)).save(d / f"oct_{f:03d}.png")
        Image.fromarray((rng.random((24, 24, 3)) * 255).astype(
            np.uint8)).save(d / "ir.png")
        if p == 0:
            Image.fromarray((rng.random((24, 24, 3)) * 255).astype(
                np.uint8)).save(d / "faf.png")
    recs = scan_paired_directory(str(tmp_path))

    # enface-only mode: no volume loaded/served
    ds = PairedOCTEnfaceDataset(recs, mode="pair_ir_only", enface_size=16)
    s = ds[0]
    assert "image" not in s and s["enface1"].shape == (16, 16, 3)
    # faf-requiring mode filters to the one FAF-carrying record
    ds = PairedOCTEnfaceDataset(recs, mode=8, num_frames=4, oct_size=16,
                                enface_size=16)
    assert len(ds) == 1 and float(ds[0]["weight2"]) == 1.0
    # mode 11 (3-mod) keeps FAF-less records (presence weights mask them)
    ds = PairedOCTEnfaceDataset(recs, mode=11, num_frames=4, oct_size=16,
                                enface_size=16)
    assert len(ds) == 3
    # int alias == name
    assert PairedOCTEnfaceDataset(recs, mode=6, num_frames=4, oct_size=16,
                                  enface_size=16).mode == "oct3d_only"

    # convert_hw_shape: device geometries fold to 60/61 x H x 768
    rng2 = np.random.default_rng(1)
    for shape in [(49, 8, 512), (121, 8, 768), (49, 8, 1024), (25, 8, 512),
                  (61, 8, 768), (121, 8, 1536), (97, 8, 512)]:
        out = convert_hw_shape(np.ones(shape, np.float32), rng=rng2)
        assert out.shape[2] == 768, (shape, out.shape)
        assert out.shape[0] in (30, 31, 60, 61), (shape, out.shape)


def test_oct_faf_ir_cls_dataset(tmp_path):
    """Manifest-driven GA-growth cls dataset: label standardization with
    preset stats and CV split indexing (multimodal_dataset.py:1303-1496)."""
    from PIL import Image
    from octcubem_tpu.data.multimodal import OCTFAFIRClsDataset

    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        vol = (rng.random((3, 16, 16)) * 255).astype(np.uint8)
        np.save(tmp_path / f"oct{i}.npy", vol)
        Image.fromarray((rng.random((16, 16, 3)) * 255).astype(
            np.uint8)).save(tmp_path / f"faf{i}.png")
        rows.append((f"oct{i}.npy", f"faf{i}.png", 1.0 + i, i % 3))
    manifest = tmp_path / "m.csv"
    manifest.write_text(
        "patient_id,oct_file_path,faf_file_path,ga_growth,split1\n"
        + "\n".join(f"p{i},{o},{f},{g},{s}"
                    for i, (o, f, g, s) in enumerate(rows)))

    ds = OCTFAFIRClsDataset(str(manifest), parent_dir=str(tmp_path),
                            mode=9, label_keys=["ga_growth"],
                            num_frames=4, oct_size=16, enface_size=16)
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape == (4, 16, 16, 1)
    assert s["label"].shape == (1,)
    labels = np.array([ds[i]["label"][0] for i in range(6)])
    np.testing.assert_allclose(labels.mean(), 0.0, atol=1e-5)

    ds.update_dataset_indexing("cv_test", val_split=0)
    assert len(ds) == 2
    ds.update_dataset_indexing("cv_train", val_split=0)
    assert len(ds) == 4

    # preset stats (val/test reuse train statistics)
    ds2 = OCTFAFIRClsDataset(str(manifest), parent_dir=str(tmp_path),
                             mode=9, label_keys=["ga_growth"],
                             num_frames=4, oct_size=16, enface_size=16,
                             preset_label_mean=[0.0], preset_label_std=[1.0])
    np.testing.assert_allclose(ds2[5]["label"][0], 6.0)


def test_bscan_coverage_geometry():
    from octcubem_tpu.data.geometry import (
        bscan_coverage_mask, oct_token_region, horizontal_line_patches)
    # one full-width line at y=100 -> one patch row covered
    lines = np.array([[0, 100, 383, 100]])
    mask = bscan_coverage_mask(lines, enface_size=384, patch_size=16)
    assert mask.sum() == 24  # full row of 384/16 patches
    assert mask[100 // 16].sum() == 24
    # flip_y mirrors the row
    mask_f = bscan_coverage_mask(lines, flip_y=True)
    assert mask_f[24 - 100 // 16 - 1].sum() == 24
    # token region: 61-frame 512-wide Heidelberg protocol
    t, d, w = oct_token_region((61, 496, 512))
    assert t == (0, 20)
    assert w == (4, 20)  # 512-wide scans cover the central 2/3
    # partial line respects the coverage threshold
    ps = horizontal_line_patches(0, 7, 0, patch_size=16, coverage=0.5)
    assert ps == []  # only 8px < half a patch
    ps = horizontal_line_patches(0, 9, 0, patch_size=16, coverage=0.5)
    assert (0, 0) in ps


def test_build_ga_manifest_roundtrip(tmp_path):
    """build_ga_manifest (dataset_management.py equivalent): walk a study
    tree of PNG-stack visits + ir/faf pairs + labels CSV into the
    manifest the cls dataset consumes; PNG-stack rows point at the visit
    directory and load through _load_volume's directory branch."""
    from PIL import Image

    from octcubem_tpu.data.multimodal import (OCTFAFIRClsDataset,
                                              build_ga_manifest)

    rng = np.random.default_rng(0)
    study = tmp_path / "study"
    for p in range(4):
        d = study / f"p{p}" / "v0"
        d.mkdir(parents=True)
        for t in range(4):
            Image.fromarray((rng.random((16, 16)) * 255).astype(
                np.uint8), "L").save(str(d / f"oct_{t:03d}.png"))
        Image.fromarray((rng.random((16, 16, 3)) * 255).astype(
            np.uint8)).save(str(d / "faf.png"))
        Image.fromarray((rng.random((16, 16, 3)) * 255).astype(
            np.uint8)).save(str(d / "ir.png"))
    labels = tmp_path / "labels.csv"
    labels.write_text("patient_id,ga_growth\n"
                      + "\n".join(f"p{p},{1.0 + p}" for p in range(4)))
    out_csv = str(tmp_path / "manifest.csv")
    n = build_ga_manifest(str(study), out_csv, labels_csv=str(labels),
                          n_splits=2)
    assert n == 4

    ds = OCTFAFIRClsDataset(out_csv, parent_dir=str(study), mode=9,
                            label_keys=["ga_growth"], num_frames=4,
                            oct_size=16, enface_size=16)
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (4, 16, 16, 1)
    assert np.isfinite(s["label"]).all()
    # patient-level 2-fold split covers both folds
    assert sorted(ds.available_split) == [0, 1]


def test_paired_dataset_epoch_redraws_augmentation(tmp_path):
    """Loader.set_epoch must reach PairedOCTEnfaceDataset and change the
    per-item augmentation rng (regression: the dataclass had no `epoch`
    attribute, so the propagation guard silently no-opped and the same
    crop/flip was drawn every epoch)."""
    from PIL import Image

    from octcubem_tpu.data.loader import Loader
    from octcubem_tpu.data.multimodal import (PairedOCTEnfaceDataset,
                                              scan_paired_directory)

    rng = np.random.default_rng(0)
    d = tmp_path / "p0" / "v0"
    os.makedirs(d)
    for f in range(4):
        Image.fromarray((rng.random((32, 32)) * 255).astype(np.uint8)).save(
            d / f"oct_{f:03d}.png")
    Image.fromarray((rng.random((24, 24, 3)) * 255).astype(np.uint8)).save(
        d / "ir.png")
    recs = scan_paired_directory(str(tmp_path))

    draws = []

    def xform(vol, rng=None):
        draws.append(float(rng.random()))
        return np.zeros((4, 16, 16), np.float32)

    ds = PairedOCTEnfaceDataset(recs, num_frames=4, oct_size=16,
                                enface_size=16, oct_transform=xform)
    assert hasattr(ds, "epoch")
    ld = Loader(ds, batch_size=1, shuffle=False, num_workers=1)
    ld.set_epoch(0)
    _ = ds[0]
    ld.set_epoch(1)
    _ = ds[0]
    assert draws[0] != draws[1], "augmentation rng must redraw per epoch"

    # the cls wrapper forwards epoch to its inner paired dataset
    from octcubem_tpu.data.multimodal import OCTFAFIRClsDataset
    import csv

    man = tmp_path / "man.csv"
    with open(man, "w", newline="") as f:
        w = csv.DictWriter(f, ["patient_id", "visit_id", "oct_file_path",
                               "faf_file_path", "ga_growth", "split1"])
        w.writeheader()
        w.writerow({"patient_id": "p0", "visit_id": "v0",
                    "oct_file_path": "p0/v0", "faf_file_path": "p0/v0/ir.png",
                    "ga_growth": "1.0", "split1": "0"})
    cds = OCTFAFIRClsDataset(str(man), parent_dir=str(tmp_path), mode=9,
                             label_keys=["ga_growth"])
    cds.epoch = 5
    assert cds._inner.epoch == 5
