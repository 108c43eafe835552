"""Runnable inference demo — the inference_OCTCube.ipynb flow.

Generates a synthetic 61-frame OCT DICOM (stand-in for the reference's
assets/oct_examples download), then runs the full pipeline: DICOM read ->
val transform (61 -> 48 frames, 256²) -> ViT-L spatiotemporal classifier
-> per-disease probabilities.  Pass --ckpt OCTCube_multitask_cls.pth to
reproduce the released model's outputs.

    python examples/inference_demo.py [--ckpt path.pth] [--volume path.dcm]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_synthetic_dicom(path: str) -> None:
    from octcubem_tpu.data.dicom import write_dicom

    rng = np.random.default_rng(0)
    vol = np.zeros((61, 496, 512), np.float32)
    # a curved retina-like band with speckle
    x = np.linspace(-1, 1, 512)
    for f in range(61):
        center = 248 + 60 * np.sin(0.8 * x * np.pi + f / 20) + (f - 30) * 0.4
        rows = np.arange(496)[:, None]
        band = np.exp(-((rows - center[None, :]) ** 2) / (2 * 45.0 ** 2))
        vol[f] = band * (150 + 40 * rng.random((496, 512)))
    write_dicom(path, vol.astype(np.uint8))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--volume", default=None)
    args = parser.parse_args()

    volume = args.volume
    if volume is None:
        volume = os.path.join(tempfile.gettempdir(), "demo_oct.dcm")
        make_synthetic_dicom(volume)
        print(f"generated synthetic OCT volume: {volume}")

    from octcubem_tpu.cli import infer

    argv = [volume]
    if args.ckpt:
        argv += ["--ckpt", args.ckpt]
    infer.main(argv)


if __name__ == "__main__":
    main()
