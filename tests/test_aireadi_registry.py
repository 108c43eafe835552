import numpy as np

from octcubem_tpu.data import aireadi
from octcubem_tpu.core import ckpt_registry
from octcubem_tpu.cli.retrieval_eval import evaluate_laterality, top3_panels


def _manifest():
    rows = []
    for i in range(12):
        rows.append({
            "participant_id": f"P{i % 6}",
            "manufacturers_model_name": ["Spectralis", "Maestro2", "Triton"][i % 3],
            "filepath": f"vol_{i}.dcm",
            "laterality": "OD" if i % 2 == 0 else "OS",
            "visit": str(i // 6),
            "label_dr": str(i % 2),
        })
    return rows


def test_aireadi_device_filter_and_split():
    rows = _manifest()
    visits = aireadi.build_aireadi_visits(rows, device="Maestro2")
    assert len(visits) == 4
    assert all(v.metadata["manufacturer"] == "Topcon" for v in visits)
    assert visits[0].labels["label_dr"] in (0, 1)

    all_v = aireadi.build_aireadi_visits(rows)
    tr, va, te = aireadi.visit_correct_split(all_v, 0.2, 0.2, seed=3)
    trp = {v.patient_id for v in tr}
    vap = {v.patient_id for v in va}
    tep = {v.patient_id for v in te}
    assert not (trp & vap) and not (trp & tep) and not (vap & tep)


def test_laterality_eval_perfect():
    rng = np.random.default_rng(0)
    n, d = 20, 8
    img = rng.standard_normal((n, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    enf = img.copy()  # paired: nearest neighbour is itself
    lat = rng.integers(0, 2, n)
    m = evaluate_laterality(img, enf, lat, lat, ks=(1,))
    assert m["laterality_acc@top1"] == 1.0
    panels = top3_panels(img, enf, n_queries=4)
    assert panels.shape == (4, 3)
    np.testing.assert_array_equal(panels[:, 0], np.arange(4))


def test_ckpt_registry_roundtrip(tmp_path):
    p = str(tmp_path / "cv.json")
    ckpt_registry.save_ckpt_registry(p, {
        0: {"best_val": "/c/f0_val", "best_test": "/c/f0_test"},
        1: {"best_val": "/c/f1_val", "best_test": "/c/f1_test"},
    })
    paths = ckpt_registry.cv_fold_ckpt_paths(p, "best_val")
    assert paths == ["/c/f0_val", "/c/f1_val"]
    found = ckpt_registry.scan_ckpt_registries(str(tmp_path))
    assert "cv" in found
