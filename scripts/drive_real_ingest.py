"""Real-ingestion pretrain epoch: compose data/loader.py with the chip.

Round-4 verdict item 6: the 7.9x loader fix was benched standalone
(scripts/bench_loader.py); no epoch had ever run on the chip fed by the
real PNG-stack ingest path.  This drive:

1. generates a production-size fixture tree (N volumes x 61 frames of
   512x1024 grayscale PNGs — the reference in-house layout,
   PatientDataset.py:524-588; 61 frames exercises the center-crop-to-60
   path),
2. runs ONE pretrain epoch through the production CLI
   (cli.pretrain --data_dir, vitl_mae_tpu_native geometry) — the full
   ingest: PNG decode -> width downsample -> pad/crop -> 3D transform ->
   collate -> premask -> joint step,
3. runs the same epoch synthetically fed (same batch/batch2d/steps), and
4. reports steady-state iter/data times for both: data-wait ~= 0 means
   the loader keeps the chip fed (compute-bound).

    RI_VOLS=48 RI_BATCH=4 python scripts/drive_real_ingest.py

Results go to stdout (JSON) and the live ledger
(octcubem_tpu.utils.recorded key 'ingest_epoch').
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_VOLS = int(os.environ.get("RI_VOLS", "48"))
BATCH = int(os.environ.get("RI_BATCH", "4"))
FRAMES, H, W = 61, 512, 1024


def make_fixture(root: str) -> None:
    """OCT-like PNGs with realistic compression/decode cost (same shapes
    as scripts/bench_loader.py)."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    yy = np.linspace(0, 4 * np.pi, H)[:, None]
    xx = np.linspace(0, 2 * np.pi, W)[None, :]
    t0 = time.time()
    for v in range(N_VOLS):
        d = os.path.join(root, f"p{v:03d}", "v0")
        os.makedirs(d, exist_ok=True)
        for t in range(FRAMES):
            img = (110 + 70 * np.sin(yy + 0.07 * t + 0.3 * v) * np.cos(xx)
                   + 18 * rng.standard_normal((H, W))).clip(0, 255)
            Image.fromarray(img.astype(np.uint8), "L").save(
                os.path.join(d, f"oct_{t:03d}.png"))
    print(f"# fixture: {N_VOLS} volumes x {FRAMES} frames "
          f"({time.time() - t0:.0f}s)", flush=True)


def run_epoch(tag: str, extra_args: list, out_dir: str) -> dict:
    """One pretrain epoch through the CLI; parse steady-state meters."""
    cfg = {"accum_2d": 4, "decoder_num_heads": 4, "batch_size": BATCH,
           # spl_k_min=1.0 keeps the full 2D set active so batch2d is
           # identical between the real (N center B-scans) and synthetic
           # (4N images) runs — apples-to-apples step times
           "batch_size_2d": 32, "spl_k_min": 1.0, "spl_k_max": 1.0,
           "epochs": 1, "output_dir": out_dir}
    cfg_path = os.path.join(out_dir, "preset.json")
    os.makedirs(out_dir, exist_ok=True)
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    cmd = [sys.executable, "-m", "octcubem_tpu.cli.pretrain",
           "--preset", cfg_path] + extra_args
    print(f"# {tag}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    wall = time.time() - t0
    sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
    if r.returncode != 0:
        raise SystemExit(f"{tag} run failed rc={r.returncode}")
    log_txt = open(os.path.join(out_dir, "out.log")).read()
    # last per-iter meter line: "... time: 1.2345 data: 0.0123"
    meters = re.findall(r"time: ([0-9.]+) data: ([0-9.]+)", log_txt)
    assert meters, f"no meter lines in {out_dir}/out.log"
    it_s, data_s = map(float, meters[-1])
    total = re.findall(r"\(([0-9.]+) s / it\)", log_txt)
    return {"iter_s": it_s, "data_s": data_s,
            "s_per_it_incl_compile": float(total[-1]) if total else None,
            "wall_s": round(wall, 1)}


def main():
    root = os.environ.get("RI_FIXTURE_DIR") or tempfile.mkdtemp(
        prefix="oct_ingest_")
    if not os.path.isdir(os.path.join(root, "p000")):
        make_fixture(root)

    runs = os.path.join(REPO, "runs")
    real = run_epoch("real-ingest", ["--data_dir", root],
                     os.path.join(runs, "ingest_real_r5"))
    syn = run_epoch("synthetic", ["--synthetic", "--synthetic_n",
                                  str(N_VOLS)],
                    os.path.join(runs, "ingest_syn_r5"))

    result = {
        "metric": "real-PNG-ingest pretrain epoch vs synthetic feed "
                  "(ViT-L native geometry, 61f 512x1024 frames)",
        "n_volumes": N_VOLS, "batch": BATCH,
        "real_iter_s": real["iter_s"], "real_data_wait_s": real["data_s"],
        "synthetic_iter_s": syn["iter_s"],
        "synthetic_data_wait_s": syn["data_s"],
        "data_wait_frac": round(real["data_s"] / max(real["iter_s"], 1e-9),
                                4),
        "real_wall_s": real["wall_s"], "synthetic_wall_s": syn["wall_s"],
    }
    print(json.dumps(result), flush=True)
    from octcubem_tpu.utils.recorded import record
    record("ingest_epoch", dict(result, source="scripts/drive_real_ingest.py"))


if __name__ == "__main__":
    main()
