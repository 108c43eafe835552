"""Checkpoint output-parity harness.

Verifies that this framework reproduces reference outputs for a released
PyTorch checkpoint: load the .pth through the importer, run the fp32
highest-precision forward on given inputs, and compare against expected
outputs produced by the reference implementation (a .npz with 'inputs'
[B, C, T, H, W] or [B, T, H, W, C] and 'expected_logits').

The synthetic-weight parity is already pinned by tests/test_torch_parity*
(1e-5 fp32); this tool closes the loop on real released checkpoints
(BASELINE.md bit-accuracy target) wherever they are available:

    python -m octcubem_tpu.cli.parity_check OCTCube_multitask_cls.pth \
        expected.npz --model_family vit_st_dropout
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser("checkpoint output parity check")
    parser.add_argument("ckpt", help="reference .pth checkpoint")
    parser.add_argument("expected_npz",
                        help="npz with inputs + expected_logits from the "
                             "reference run")
    parser.add_argument("--model_family", default="vit_st_dropout")
    parser.add_argument("--model", default="flash_attn_vit_large_patch16")
    parser.add_argument("--num_frames", type=int, default=48)
    parser.add_argument("--input_size", type=int, default=256)
    parser.add_argument("--t_patch_size", type=int, default=3)
    parser.add_argument("--num_classes", type=int, default=16)
    parser.add_argument("--atol", type=float, default=1e-3)
    # architecture overrides (match the checkpoint's dims when they differ
    # from the named constructor, e.g. for reduced test checkpoints)
    parser.add_argument("--embed_dim", type=int, default=None)
    parser.add_argument("--depth", type=int, default=None)
    parser.add_argument("--num_heads", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    from ..models import registry
    from ..compat.torch_import import load_torch_checkpoint, import_state_dict

    data = np.load(args.expected_npz)
    x = np.asarray(data["inputs"], np.float32)
    expected = np.asarray(data["expected_logits"], np.float32)
    if x.ndim == 5 and x.shape[1] in (1, 3) and x.shape[1] < x.shape[-1]:
        x = x.transpose(0, 2, 3, 4, 1)  # torch [B,C,T,H,W] -> channel-last

    kw = dict(num_frames=args.num_frames, t_patch_size=args.t_patch_size,
              img_size=args.input_size, in_chans=x.shape[-1],
              num_classes=args.num_classes)
    if args.embed_dim or args.depth or args.num_heads:
        from ..models.vit_st import VisionTransformerST

        model = VisionTransformerST(
            embed_dim=args.embed_dim or 1024, depth=args.depth or 24,
            num_heads=args.num_heads or 16,
            head_type=("dropout" if "dropout" in args.model_family
                       else "aggregate"), **kw)
    else:
        model = registry.create_model(args.model_family, args.model, **kw)
    params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(x[:1]))
    from ..compat.torch_import import check_geometry_stamp

    check_geometry_stamp(args.ckpt, args.num_heads or 16)
    sd = load_torch_checkpoint(args.ckpt)
    params, report = import_state_dict(params, sd)
    if report["missing"]:
        print(f"WARNING missing params (kept at init): {report['missing']}")

    logits = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)))
    err = np.abs(logits - expected)
    print(f"max abs err: {err.max():.3e}  mean: {err.mean():.3e}  "
          f"(atol {args.atol})")
    agree = np.argmax(logits.reshape(len(x), -1, 2), -1) == \
        np.argmax(expected.reshape(len(x), -1, 2), -1)
    print(f"per-disease argmax agreement: {agree.mean() * 100:.2f}%")
    if err.max() <= args.atol:
        print("PARITY: PASS")
        return 0
    print("PARITY: FAIL")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
