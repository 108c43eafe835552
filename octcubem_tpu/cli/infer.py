"""Single-volume 8-disease inference — the notebook demo path.

Parity target: inference_OCTCube.ipynb cells 4-10 + inference_utils.py:
load a DICOM OCT volume, val-transform to (48, 256, 256), run the
ViT-L spatiotemporal classifier (dropout variant, global pool), reshape
logits to (8, 2), softmax, print per-disease probabilities.

The parity path runs fp32 with highest matmul precision (the reference's
fp16-autocast GPU numerics are approximated from above).
"""

from __future__ import annotations

import argparse

import numpy as np

DISEASES = ["Normal", "DME", "AMD", "POAG", "EPM", "DR", "VD", "RAO\\RVO", "RNV"]


def build_model_and_params(args):
    import jax
    import jax.numpy as jnp

    from ..models import vit_st
    from ..compat.torch_import import load_torch_checkpoint, import_state_dict

    dtype = jnp.float32 if args.precision == "fp32" else jnp.bfloat16
    model = vit_st.flash_attn_vit_large_patch16(
        num_frames=args.num_frames, t_patch_size=args.t_patch_size,
        img_size=args.input_size, in_chans=1, num_classes=args.nb_classes,
        head_type="dropout", global_pool=args.global_pool,
        num_heads=args.num_heads,
        sep_pos_embed=args.sep_pos_embed, cls_embed=args.cls_embed,
        drop_path_rate=args.drop_path, dtype=dtype, attn_impl=args.attn_impl,
        capture_cam=bool(getattr(args, "saliency_dir", None)),
    )
    x0 = jnp.zeros((1, args.num_frames, args.input_size, args.input_size, 1))
    params = jax.jit(model.init)(jax.random.key(0), x0)
    if args.ckpt:
        from ..compat.torch_import import check_geometry_stamp
        check_geometry_stamp(args.ckpt, args.num_heads)
        sd = load_torch_checkpoint(args.ckpt)
        params, report = import_state_dict(params, sd)
        if report["missing"]:
            print(f"warning: missing params filled from init: {report['missing']}")
        print(f"Load checkpoint {args.ckpt}")
    else:
        print("No checkpoint for loading")
    return model, params


def process_volume(path: str, num_frames: int, input_size: int) -> np.ndarray:
    """DICOM/npy -> [1, T, H, W, 1] val-transformed volume
    (inference_utils.py:24-27: monai val resize, /255)."""
    from ..data.transforms import create_3d_transforms

    if path.endswith(".npy"):
        vol = np.load(path).astype(np.float32)
    else:
        from ..data.dicom import read_dicom
        vol = read_dicom(path).pixel_array.astype(np.float32)
    _, val_t = create_3d_transforms(input_size=input_size,
                                    num_frames=num_frames, RandFlipd_prob=0)
    vol = val_t(vol) / 255.0
    return vol[None, ..., None]


def parse_all_output(probs: np.ndarray) -> str:
    """Per-disease probability printout (inference_utils.py:62-80)."""
    highest = int(np.argmax(probs[:, 1]))
    p = float(probs[highest, 1])
    disease_flag = p > 0.5
    out = "Disease probability: (Disease Name: Probability) \n"
    n = min(len(DISEASES), probs.shape[0] + 1)
    for i, name in enumerate(DISEASES[:n]):
        if i == 0:
            val = 1 - p if disease_flag else float(np.mean(probs[:, 0]))
        else:
            val = float(probs[i - 1, 1])
        out += f"{name}: {val:.3f}    "
    return out


def main(argv=None):
    parser = argparse.ArgumentParser("OCTCube-TPU single-volume inference")
    parser.add_argument("volume", help=".dcm or .npy OCT volume")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--model", default="flash_attn_vit_large_patch16")
    parser.add_argument("--t_patch_size", type=int, default=3)
    parser.add_argument("--num_frames", type=int, default=48)
    parser.add_argument("--input_size", type=int, default=256)
    parser.add_argument("--nb_classes", type=int, default=16)
    parser.add_argument("--num_heads", type=int, default=16,
                        help="encoder heads — must match the checkpoint's "
                             "pretrain geometry (16 = reference ckpts, 8 = "
                             "TPU-native-pretrained encoders)")
    parser.add_argument("--drop_path", type=float, default=0.2)
    parser.add_argument("--global_pool", action="store_true", default=True)
    parser.add_argument("--sep_pos_embed", action="store_true", default=True)
    parser.add_argument("--cls_embed", action="store_true", default=True)
    parser.add_argument("--precision", default="fp32")
    parser.add_argument("--attn_impl", default="auto")
    parser.add_argument("--saliency_dir", default=None,
                        help="write a Grad-CAM overlay PNG for the "
                             "top-probability disease into this directory "
                             "(reference oph_vis_util CAM rendering)")
    args = parser.parse_args(argv)

    from ..core.runtime import setup_compilation_cache
    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    if args.precision == "fp32":
        jax.config.update("jax_default_matmul_precision", "highest")

    # read + preprocess the volume BEFORE building the (expensive) model so
    # bad inputs fail in milliseconds, not minutes
    vol = jnp.asarray(process_volume(args.volume, args.num_frames,
                                     args.input_size))
    model, params = build_model_and_params(args)
    logits = jax.jit(model.apply)(params, vol)
    logits = np.asarray(logits).reshape(-1, 2)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    print(parse_all_output(probs))

    if args.saliency_dir:
        # Grad-CAM for the top-probability disease's 'disease' logit
        # (the (i, 1) column of the reshaped head), rendered as heatmap
        # overlays on the input frames
        from ..utils.saliency import gradcam
        from ..utils.visualization import save_cam_overlays

        top = int(np.argmax(probs[:, 1]))
        t_grid = args.num_frames // args.t_patch_size
        s_grid = args.input_size // model.patch_size
        cam = gradcam(model, params, vol, class_idx=2 * top + 1,
                      grid=(t_grid, s_grid, s_grid))
        name = DISEASES[1:][top] if top + 1 < len(DISEASES) else str(top)
        path = save_cam_overlays(np.asarray(vol)[0, ..., 0], cam[0],
                                 args.saliency_dir,
                                 tag=f"cam_{name.replace(chr(92), '-')}")
        print(f"saliency overlay: {path}")
    return probs


if __name__ == "__main__":
    main()
