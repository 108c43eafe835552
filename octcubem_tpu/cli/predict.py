"""Batch inference / serving: directory of OCT volumes -> predictions CSV.

Production counterpart of the single-volume notebook demo (cli/infer.py):
walks a patient tree (PNG stacks / npy / DICOM), batches volumes through
the jitted classifier (bf16 by default for throughput; --precision fp32
for the parity path), and writes per-volume 8-disease probabilities +
embeddings.

    python -m octcubem_tpu.cli.predict data_root --ckpt OCTCube_multitask_cls.pth
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np

DISEASES = ["DME", "AMD", "POAG", "EPM", "DR", "VD", "RAO_RVO", "RNV"]


def main(argv=None):
    parser = argparse.ArgumentParser("OCTCube-TPU batch inference")
    parser.add_argument("data_dir")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--out_csv", default="predictions.csv")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--num_frames", type=int, default=48)
    parser.add_argument("--input_size", type=int, default=256)
    parser.add_argument("--nb_classes", type=int, default=16)
    parser.add_argument("--precision", default="bf16")
    parser.add_argument("--quant", choices=["none", "int8"], default="none",
                        help="int8: PTQ the block projections (s8xs8->s32 "
                             "MXU, ops/quant.py); attention stays bf16 flash")
    parser.add_argument("--dump_embeddings", default=None,
                        help="optional .npz path for pre-head embeddings")
    parser.add_argument("--export_aot", default=None,
                        help="write a self-contained jax.export serving "
                             "artifact (weights baked in, compat/aot.py) "
                             "instead of predicting, then exit")
    parser.add_argument("--aot_platforms", default=None,
                        help="comma list for --export_aot (e.g. 'tpu,cpu'); "
                             "default: current backend")
    parser.add_argument("--aot", default=None,
                        help="serve from an exported artifact instead of "
                             "building the model (shape args come from the "
                             "artifact header)")
    parser.add_argument("--n_data", type=int, default=1,
                        help="data-parallel serving over N devices "
                             "(0 = all local devices; batch_size must "
                             "divide evenly)")
    # tiny-dims overrides for smoke runs
    parser.add_argument("--embed_dim", type=int, default=None)
    parser.add_argument("--depth", type=int, default=None)
    parser.add_argument("--num_heads", type=int, default=None)
    args = parser.parse_args(argv)

    from ..core.runtime import setup_compilation_cache
    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ..models.vit_st import VisionTransformerST
    from ..compat.torch_import import load_torch_checkpoint, import_state_dict
    from ..data import patients, transforms, loader as loader_lib
    from ..utils.logging import get_logger, Throughput

    log = get_logger("predict")
    aot_fn = None
    if args.aot:
        # shapes/classes are baked into the artifact; its header overrides
        # the CLI shape flags so preprocessing matches the lowered graph
        from ..compat.aot import load_serving_artifact

        aot_fn, aot_meta = load_serving_artifact(args.aot)
        b, t, s = aot_meta["in_shapes"][0][:3]
        args.batch_size, args.num_frames, args.input_size = b, t, s
        args.nb_classes = aot_meta.get("nb_classes", args.nb_classes)
        if args.n_data not in (0, 1):
            raise SystemExit("--aot serves single-device; drop --n_data")
        args.n_data = 1
        log.info(f"serving from AOT artifact {args.aot} "
                 f"(batch {b}, {t}x{s}x{s}, {aot_meta.get('quant')})")

    ld = None
    if not args.export_aot:
        visits = patients.scan_directory(args.data_dir, "*.png")
        if not visits:
            visits = patients.scan_directory(args.data_dir, "oct_*.png")
        if not visits:
            raise ValueError(f"no volumes found under {args.data_dir}")
        _, val_t = transforms.create_3d_transforms(
            args.input_size, args.num_frames, RandFlipd_prob=0)
        label_fn = lambda v: np.int64(0)
        ds = patients.PatientDataset3D(
            visits, label_fn, dataset_mode=(
                "dicom" if visits[0].frames[0].endswith(".dcm")
                else "volume" if visits[0].frames[0].endswith(".npy")
                else "frame"),
            max_frames=args.num_frames, transform=val_t,
            return_patient_id=True)
        ld = loader_lib.Loader(ds, args.batch_size, shuffle=False,
                               drop_last=False, num_workers=4)

    model = None
    if not args.aot:
        dtype = jnp.float32 if args.precision == "fp32" else jnp.bfloat16
        if args.precision == "fp32":
            jax.config.update("jax_default_matmul_precision", "highest")
        model_kw = dict(
            num_frames=args.num_frames, t_patch_size=3,
            img_size=args.input_size, in_chans=1,
            num_classes=args.nb_classes,
            embed_dim=args.embed_dim or 1024, depth=args.depth or 24,
            num_heads=args.num_heads or 16, head_type="dropout",
            global_pool=True, dtype=dtype)
        model = VisionTransformerST(**model_kw, quant=args.quant == "int8")
        # checkpoints are fp32; import into the float layout, then
        # PTQ-convert
        fp_model = (VisionTransformerST(**model_kw) if args.quant == "int8"
                    else model)
        x0 = jnp.zeros((args.batch_size, args.num_frames, args.input_size,
                        args.input_size, 1))
        params = jax.jit(fp_model.init)(jax.random.key(0), x0)
        if args.ckpt:
            from ..compat.torch_import import check_geometry_stamp
            check_geometry_stamp(args.ckpt, args.num_heads or 16)
            sd = load_torch_checkpoint(args.ckpt)
            params, rep = import_state_dict(params, sd, strict=False)
            log.info(f"loaded {args.ckpt}")
        if args.quant == "int8":
            from ..ops.quant import quantize_tree
            params = jax.jit(
                lambda p: {"params": quantize_tree(p["params"])})(params)
            log.info("int8 PTQ applied to block projections")

    if args.export_aot:
        # freeze (params, forward) into one deployable file and exit
        from ..compat.aot import export_serving_artifact

        platforms = (tuple(p.strip() for p in args.aot_platforms.split(","))
                     if args.aot_platforms else None)
        path = export_serving_artifact(
            lambda x: model.apply(params, x, return_embeddings=True),
            (jnp.zeros((args.batch_size, args.num_frames, args.input_size,
                        args.input_size, 1), jnp.float32),),
            args.export_aot, platforms=platforms,
            meta={"model": "vit_st", "nb_classes": args.nb_classes,
                  "quant": args.quant, "precision": args.precision})
        log.info(f"wrote AOT serving artifact {path}")
        return path

    # multi-chip serving (--n_data N, or 0 = all devices): shard each
    # batch over the mesh 'data' axis with params replicated.  Mirrors
    # the training-side DDP->mesh design — pjit emits the collectives;
    # default 1 keeps the single-chip path.
    n_dev = args.n_data if args.n_data > 0 else len(jax.devices())
    mesh = None
    if n_dev > 1:
        from ..core import mesh as meshlib
        from ..train.mae_engine import shard_batch, replicate_state

        if args.batch_size % n_dev:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be divisible by "
                f"the {n_dev}-device data axis")
        mesh = meshlib.make_mesh(n_data=n_dev)
        params = replicate_state(params, mesh)
        log.info(f"serving data-parallel over {n_dev} devices")

    if aot_fn is not None:
        predict = lambda p, x: aot_fn(x)
        params = None
    else:
        predict = jax.jit(
            lambda p, x: model.apply(p, x, return_embeddings=True))
    tput = Throughput()
    rows = []
    embeddings = []

    def consume(logits, emb, pids):
        # bf16 -> f32 on host (ml_dtypes scalars don't support float
        # formatting, and softmax in f32 is cheap here)
        logits = np.asarray(logits).astype(np.float32)
        logits = logits[: len(pids)].reshape(len(pids), -1, 2)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = (e / e.sum(-1, keepdims=True))[:, :, 1]
        for pid, p in zip(pids, probs):
            rows.append([pid] + [f"{v:.4f}" for v in p])
        embeddings.append(np.asarray(emb)[: len(pids)])
        tput.update(len(pids))
        return probs

    # one-batch-deep pipeline: consume batch t-1's device results after
    # dispatching batch t, so volume loading overlaps TPU compute
    probs = None
    pending = None
    for batch in ld:
        vols, pids, _ = batch
        x = jnp.asarray(vols)
        if x.shape[0] < args.batch_size:  # pad the tail batch (static jit)
            pad = args.batch_size - x.shape[0]
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:])], 0)
        if mesh is not None:
            x = shard_batch(x, mesh)
        logits, emb = predict(params, x)
        if pending is not None:
            probs = consume(*pending)
        pending = (logits, emb, pids)
    if pending is not None:
        probs = consume(*pending)
    with open(args.out_csv, "w", newline="") as f:
        w = csv.writer(f)
        names = DISEASES if probs.shape[1] == len(DISEASES) else \
            [f"class_{i}" for i in range(probs.shape[1])]
        w.writerow(["patient_id"] + names)
        w.writerows(rows)
    if args.dump_embeddings:
        np.savez(args.dump_embeddings,
                 embeddings=np.concatenate(embeddings),
                 patient_ids=[r[0] for r in rows])
    log.info(f"wrote {len(rows)} predictions to {args.out_csv} "
             f"({tput.rate:.2f} volumes/s)")
    return rows


if __name__ == "__main__":
    main()
