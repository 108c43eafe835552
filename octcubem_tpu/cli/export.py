"""Export an orbax training checkpoint to a reference-loadable .pth.

The hand-back half of the interchange story (compat/torch_export.py):
a model pretrained or fine-tuned in this framework becomes a torch
state dict the reference ecosystem loads directly — the flash
`mixer.Wqkv` layout that models_vit_st_flash_attn_nodrop /
models_mae_joint_res_flash_attn checkpoints use on disk (the importer
side of those files maps other layouts INTO it,
OCTCube/models_mae_flash_attn.py:361-405), or the RETFound `attn.qkv`
layout for the non-flash/timm consumers.

    python -m octcubem_tpu.cli.export \
        --ckpt ./output_pretrain            # run dir, its ckpt/, or a step dir parent
        --out ./octcube_tpu_export.pth \
        [--step 40] [--style flash|retfound] [--subtree params/visual]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser("OCTCube-TPU checkpoint export")
    parser.add_argument("--ckpt", required=True,
                        help="training run dir (or its ckpt/ dir)")
    parser.add_argument("--out", required=True, help="output .pth path")
    parser.add_argument("--step", type=int, default=None,
                        help="checkpoint step (default: latest)")
    parser.add_argument("--style", default="flash",
                        choices=["flash", "retfound"])
    parser.add_argument("--subtree", default=None,
                        help="'/'-separated param subtree to export (e.g. "
                             "'params/clip/visual' for a COEM tower)")
    args = parser.parse_args(argv)

    from ..core.checkpoint import restore_raw
    from ..compat.torch_export import export_state_dict, save_torch_checkpoint

    ckpt_dir = args.ckpt
    if os.path.isdir(os.path.join(ckpt_dir, "ckpt")):
        ckpt_dir = os.path.join(ckpt_dir, "ckpt")
    raw, step = restore_raw(ckpt_dir, args.step)
    params = raw["params"] if isinstance(raw, dict) and "params" in raw else raw
    if args.subtree:
        for key in args.subtree.strip("/").split("/"):
            if key not in params:
                raise SystemExit(
                    f"subtree key {key!r} not found; available: "
                    f"{sorted(params)[:20]}")
            params = params[key]
    sd = export_state_dict(params, style=args.style)
    # stamp the source run's geometry into the .pth (reference loaders
    # ignore extra keys) and WARN on non-reference head partitionings:
    # the tensors are reference-shaped either way, but the reference
    # constructors hardcode 16 heads — an enc8-pretrained encoder loaded
    # there would silently compute the wrong function
    extra = {"epoch": int(step)}
    run_dir = args.ckpt[:-len("/ckpt")] if args.ckpt.rstrip("/").endswith(
        "ckpt") else args.ckpt
    args_json = os.path.join(run_dir, "args.json")
    if os.path.exists(args_json):
        import json

        try:
            with open(args_json) as f:
                run_cfg = json.load(f)
        except ValueError:
            run_cfg = {}
        geom = {k: run_cfg[k] for k in
                ("model", "num_heads", "decoder_num_heads", "num_frames",
                 "t_patch_size", "input_size") if k in run_cfg}
        if geom:
            extra["octcubem_tpu_geometry"] = geom
        if run_cfg.get("num_heads", 16) != 16:
            print(f"WARNING: this run was pretrained with num_heads="
                  f"{run_cfg['num_heads']} (TPU-native encoder "
                  "repartition).  The reference constructors hardcode 16 "
                  "heads — loading this .pth there computes a DIFFERENT "
                  "function unless the torch model is built with "
                  f"num_heads={run_cfg['num_heads']}.  Geometry is "
                  "stamped under key 'octcubem_tpu_geometry'.")
    save_torch_checkpoint(args.out, sd, extra=extra)
    print(f"exported step {step} -> {args.out} "
          f"({len(sd)} tensors, style={args.style})")
    return args.out


if __name__ == "__main__":
    main()
