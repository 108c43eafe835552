"""Host data-pipeline throughput: can the loader feed the chip?

The training step consumes 16.3 vol/s/chip (bench.py); the input
pipeline (PNG-stack decode -> width downsample -> pad/crop -> MONAI-
equivalent 3D transform -> collate) runs on the host CPU.  This bench
measures end-to-end loader vol/s on a realistic fixture (61 frames of
512x1024 grayscale per volume, the reference's in-house frame layout)
and the native-C++-vs-PIL decode split.

    python scripts/bench_loader.py [n_volumes] [n_workers]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VOLS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
N_WORKERS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
FRAMES, H, W = 61, 512, 1024


def make_fixture(root: str) -> list:
    """Smooth-ish OCT-like PNGs (realistic compression/decode cost)."""
    from PIL import Image

    from octcubem_tpu.data.patients import Visit

    rng = np.random.default_rng(0)
    yy = np.linspace(0, 4 * np.pi, H)[:, None]
    xx = np.linspace(0, 2 * np.pi, W)[None, :]
    visits = []
    for v in range(N_VOLS):
        d = os.path.join(root, f"p{v:03d}")
        os.makedirs(d)
        paths = []
        for t in range(FRAMES):
            img = (110 + 70 * np.sin(yy + 0.07 * t) * np.cos(xx)
                   + 18 * rng.standard_normal((H, W))).clip(0, 255)
            p = os.path.join(d, f"oct_{t:03d}.png")
            Image.fromarray(img.astype(np.uint8), "L").save(p)
            paths.append(p)
        visits.append(Visit(patient_id=f"p{v:03d}", visit_id="v0",
                            frames=paths))
    return visits


def timeit(fn, reps):
    fn()  # warm (native .so build, page cache)
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    from octcubem_tpu import native
    from octcubem_tpu.data import ingest, loader, transforms
    from octcubem_tpu.data.patients import PatientDataset3D

    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    visits = make_fixture(tmp)
    fixture_mb = sum(os.path.getsize(p) for p in visits[0].frames) / 1e6
    print(f"fixture: {N_VOLS} volumes x {FRAMES} frames of {H}x{W} "
          f"({fixture_mb:.1f} MB/volume on disk)")

    # --- decode-only split: native C++ vs PIL
    paths = visits[0].frames
    t_native = (timeit(lambda: ingest.load_frame_stack(paths), 3)
                if native.available() else None)
    real_loader = native.load_png_stack_native
    native.load_png_stack_native = lambda *a, **k: None  # force PIL
    t_pil = timeit(lambda: ingest.load_frame_stack(paths), 3)
    native.load_png_stack_native = real_loader
    if t_native is not None:
        print(f"decode+downsample per volume: native {t_native*1e3:.0f} ms "
              f"({1/t_native:.2f} vol/s) | PIL {t_pil*1e3:.0f} ms "
              f"({1/t_pil:.2f} vol/s) -> native {t_pil/t_native:.2f}x")
    else:
        print(f"decode per volume: PIL {t_pil*1e3:.0f} ms (native unavailable)")

    # --- full pipeline: dataset __getitem__ (decode + pad/crop + 3D
    # transform) through the threaded Loader, train-transform mode
    train_t, _ = transforms.create_3d_transforms(input_size=256,
                                                 num_frames=60)
    ds = PatientDataset3D(visits=visits, label_fn=lambda v: 0,
                          dataset_mode="frame", max_frames=60,
                          transform=train_t, return_frame_paths=True)
    ld = loader.Loader(ds, batch_size=2, num_workers=N_WORKERS, seed=1)

    def epoch():
        n = 0
        for batch, _, _ in ld:
            n += batch.shape[0]
        return n

    n = epoch()  # warm
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        n = epoch()
    dt = (time.perf_counter() - t0) / reps
    vps = n / dt
    print(f"full pipeline ({N_WORKERS} workers, batch 2): "
          f"{vps:.2f} vol/s ({dt/n*1e3:.0f} ms/vol)")
    print(f"train-step demand is 16.3 vol/s/chip (bench.py): pipeline "
          f"{'KEEPS UP' if vps >= 16.3 else 'UNDERFEEDS'} at "
          f"{vps/16.3:.2f}x demand")

    # --- the joint step's 2D high-res branch: Pretrain2DDataset at 512^2
    # (center frames as tubes; demand at the production joint config is
    # ~84 img/s — accum_2d=4, 2D batch 64, 759ms step)
    from octcubem_tpu.data import spl as spl_lib

    ds2 = spl_lib.Pretrain2DDataset(visits=visits, size=512, t_patch=3)
    k = min(48, len(ds2))
    t2 = timeit(lambda: [ds2[i] for i in range(k)], 2) / k
    ips = 1 / t2
    print(f"2D 512^2 branch: {t2*1e3:.1f} ms/img ({ips:.1f} img/s/core)")
    print(f"host cores per chip: 3D-only step (16.3 vol/s) needs "
          f"{16.3/vps:.1f}; production joint step (5.27 vol/s + 84 img/s, "
          f"NOTES_ROUND3) needs {5.27/vps + 84/ips:.1f}")


if __name__ == "__main__":
    main()
