"""CLIP-classification fine-tune: COEM towers + classification head.

Parity target: retinal-COEM/src/training/main_retclip_finetune_more_cls.py
and ..._3mod.py (SURVEY §2.8): k-fold CV over GA-growth / disease labels
using CustomTextCLIP(3Mod)Classification, single-modality ablation via
--single_modality, CV checkpoint registry.

Real-data flow (the reference's GA-growth pipeline):
- ``--manifest_csv``/``--parent_dir`` feed OCTFAFIRClsDataset (modes
  9/10/12, multimodal_dataset.py:1303-1496); folds come from the
  manifest's split column.
- Labels are standardized with the TRAIN-fold statistics, reused for
  val/test/independent-test (multimodal_dataset.py:1338-1350).
- Towers initialize from a TRAINED retclip checkpoint (``--init_ckpt``;
  the reference loads the contrastive state_dict strict=False so only
  the classification head is fresh, main_…_3mod.py:452-470).
- Per-label best-val tracking (r2_k = pearson², main_…_3mod.py:48-50,
  104-126) with test and INDEPENDENT-test metrics captured at each new
  val best (:52-158 init/update_ongoing_best_metric_list_collection);
  a summary JSON mirrors the ongoing-best collection.

Without a manifest the synthetic path (training/data.py synthetic mode)
drives the same engine steps.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _build_parser():
    parser = argparse.ArgumentParser("OCTCube-TPU retclip classification")
    parser.add_argument("--three_mod", action="store_true")
    parser.add_argument("--single_modality", default=None,
                        choices=[None, "image", "enface", "enface1", "enface2"])
    parser.add_argument("--num_classes", type=int, default=2,
                        help="classes (synthetic multi_cls) — manifest "
                             "runs take the output count from label_keys")
    parser.add_argument("--k_folds", type=int, default=2)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=0.1)
    parser.add_argument("--synthetic_n", type=int, default=32)
    parser.add_argument("--output_dir", default="./output_retclip_cls")
    parser.add_argument("--tiny", action="store_true")
    # real GA-growth flow
    parser.add_argument("--manifest_csv", default=None,
                        help="OCTFAFIRClsDataset manifest (build_ga_manifest)")
    parser.add_argument("--parent_dir", default="",
                        help="root the manifest's relative paths resolve from")
    parser.add_argument("--multimodal_type", default="oct3d_paired_faf_cls",
                        help="9/10/12 or their names (data/multimodal.py "
                             "MODE_MAPPING)")
    parser.add_argument("--label_keys", default=None,
                        help="comma-separated manifest label columns")
    parser.add_argument("--split_key", default="split1")
    parser.add_argument("--task", default=None,
                        choices=[None, "regression", "multi_cls"],
                        help="default: regression for manifest runs "
                             "(GA growth), multi_cls for synthetic")
    parser.add_argument("--independent_manifest_csv", action="append",
                        default=None,
                        help="repeatable: held-out independent test "
                             "manifest(s), never used for fold selection")
    parser.add_argument("--init_ckpt", default=None,
                        help="trained retclip run dir (or its ckpt/ dir) "
                             "for tower initialization")
    # the reference builds its cls models through the same JSON-config
    # factory as retclip (create_model_and_transforms at
    # main_retclip_finetune_more_cls_3mod.py:345 via factory.py:232-352)
    parser.add_argument("--model_config", default=None,
                        help="COEM JSON config name/path (models/configs) "
                             "— tower geometry from the config; the "
                             "--tiny/default geometries are the fallback")
    # LiT locking, same surface as cli/retclip.py (the reference supports
    # lock_image in the cls fine-tune too,
    # main_retclip_finetune_more_cls_3mod.py:364-371)
    parser.add_argument("--lock_image", action="store_true",
                        help="freeze the visual trunk except the last "
                             "--lock_image_unlocked_groups groups (real "
                             "partition freeze: no frozen backward, no "
                             "frozen optimizer moments)")
    parser.add_argument("--lock_image_unlocked_groups", type=int, default=9)
    return parser


def _model_cfgs(args):
    if args.tiny:
        vcfg = dict(num_frames=6, t_patch_size=3, img_size=32, patch_size=16,
                    in_chans=1, embed_dim=32, depth=2, num_heads=2)
        ecfg = dict(img_size=32, patch_size=16, in_chans=3, embed_dim=32,
                    depth=2, num_heads=2)
        edim = 16
    else:
        vcfg = dict(num_frames=60, t_patch_size=3, img_size=256, patch_size=16,
                    in_chans=1, embed_dim=1024, depth=24, num_heads=16)
        ecfg = dict(img_size=384, patch_size=16, in_chans=3, embed_dim=1024,
                    depth=24, num_heads=16)
        edim = 512
    return vcfg, ecfg, edim


def _make_model(args, num_outputs, vcfg, ecfg, edim):
    from ..models import coem

    if args.three_mod:
        ecfg = dict(ecfg, num_mod_head=2)
        return coem.COEP3TowerClassification(
            embed_dim=edim, num_classes=num_outputs,
            vision_cfg=vcfg, enface_cfg=ecfg)
    return coem.COEP2TowerClassification(
        embed_dim=edim, num_classes=num_outputs,
        vision_cfg=vcfg, enface_cfg=ecfg)


def _build_model(args, num_outputs):
    """Model + tower geometries: from --model_config via the shared COEM
    JSON factory (registry.create_coem_model — the same path
    cli/retclip.py uses, mirroring the reference's
    create_model_and_transforms build at
    main_retclip_finetune_more_cls_3mod.py:345), else the flag-driven
    fallback geometries.  Returns (model, vcfg, ecfg)."""
    if args.model_config:
        from ..models import coem, registry

        model = registry.create_coem_model(args.model_config,
                                           num_classes=num_outputs)
        is3 = isinstance(model, coem.COEP3TowerClassification)
        if args.three_mod and not is3:
            raise SystemExit(
                f"--model_config {args.model_config} is a 2-tower config "
                "but the run needs 3 modalities (--three_mod / a "
                "faf+ir manifest mode)")
        args.three_mod = is3
        return model, dict(model.vision_cfg or {}), dict(model.enface_cfg or {})
    vcfg, ecfg, edim = _model_cfgs(args)
    return _make_model(args, num_outputs, vcfg, ecfg, edim), vcfg, ecfg


def _lock_partition(args, params, vcfg, log):
    """Optional LiT lock partition for the cls fine-tune: freeze the
    visual trunk except the last N groups (reference
    model.lock_image_tower at main_retclip_finetune_more_cls_3mod.py:
    364-371; group arithmetic in optim.lit_lock_scales)."""
    if not args.lock_image:
        return None
    import jax

    from ..train import optim

    # the cls models nest the contrastive towers under 'clip/'
    # (COEP2TowerClassification wraps a COEP2Tower submodule), so the
    # tower prefix is 'clip/visual/' here — matching bare 'visual/'
    # would silently unlock everything (the round-2/3 no-op bug class)
    root = params.get("params", params)
    prefix = "clip/visual/" if "clip" in root else "visual/"
    assert ("clip" in root) or ("visual" in root), (
        "no visual tower found to lock in the param tree")
    scales = optim.lit_lock_scales(params, vcfg.get("depth", 24),
                                   args.lock_image_unlocked_groups,
                                   tower_prefix=prefix)
    n_frozen = sum(int(s == 0) for s in jax.tree.leaves(scales))
    assert n_frozen > 0 or args.lock_image_unlocked_groups >= \
        vcfg.get("depth", 24) + 2, "lock matched no parameters"
    partition = optim.make_partition(jax.tree.map(lambda s: s > 0, scales))
    log.info(f"LiT lock: {n_frozen} frozen param tensors, "
             f"{args.lock_image_unlocked_groups} unlocked groups")
    return partition


def main(argv=None):
    args = _build_parser().parse_args(argv)
    from ..core import multihost

    multihost.announce()  # join a pod cluster when the env opts in
    if args.manifest_csv:
        return _main_manifest(args)
    return _main_synthetic(args)


# ------------------------------------------------------------- synthetic

def _main_synthetic(args):
    import jax
    import jax.numpy as jnp

    from ..core import mesh as meshlib, ckpt_registry, checkpoint as ckpt_lib
    from ..train import optim, losses, clip_engine
    from ..train.train_state import TrainState
    from ..train.mae_engine import shard_batch
    from ..train import metrics as metrics_lib
    from ..utils.logging import get_logger, JsonlLogger

    os.makedirs(args.output_dir, exist_ok=True)
    log = get_logger("retclip_cls", os.path.join(args.output_dir, "out.log"))
    model, vcfg, ecfg = _build_model(args, args.num_classes)
    # 2D-vision configs (retfound2d/retfound3dhead) carry no num_frames;
    # default 60 like cli/retclip.py's reader
    frames, osz, esz = (vcfg.get("num_frames", 60), vcfg["img_size"],
                        ecfg["img_size"])

    def sample(i):
        rng = np.random.default_rng((11, i))
        label = i % args.num_classes
        vol = rng.random((frames, osz, osz, 1), np.float32) + 0.1 * label
        enf = rng.random((esz, esz, 3), np.float32) + 0.1 * label
        return vol, enf, np.int64(label)

    items = [sample(i) for i in range(args.synthetic_n)]
    mesh = meshlib.make_mesh()
    n_data = mesh.shape[meshlib.DATA_AXIS]
    batch = max(n_data, (args.batch_size // n_data) * n_data)

    sm = args.single_modality
    if args.three_mod and sm == "enface":
        sm = "enface1"

    def batches(idx, shuffle_seed=None):
        idx = list(idx)
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(idx)
        for s in range(0, len(idx) - batch + 1, batch):
            sel = [items[i] for i in idx[s:s + batch]]
            vol = jnp.asarray(np.stack([x[0] for x in sel]))
            enf = jnp.asarray(np.stack([x[1] for x in sel]))
            y = jnp.asarray(np.stack([x[2] for x in sel]))
            if args.three_mod:
                yield {"image": vol, "enface1": enf, "enface2": enf[:, ::-1],
                       "label": y}
            else:
                yield {"image": vol, "enface": enf, "label": y}

    registry_entries = {}
    jsonl = JsonlLogger(args.output_dir, "results.jsonl")
    fold_splits = np.array_split(np.arange(len(items)), args.k_folds)

    for fold in range(args.k_folds):
        val_idx = fold_splits[fold]
        train_idx = np.concatenate(
            [fold_splits[j] for j in range(args.k_folds) if j != fold])
        b0 = next(batches(train_idx))
        init_args = ((b0["image"], b0["enface1"], b0["enface2"])
                     if args.three_mod else (b0["image"], b0["enface"]))
        params = model.init(jax.random.key(fold), *init_args,
                            single_modality=sm)
        partition = _lock_partition(args, params, vcfg, log)
        if partition is not None:
            tr0, _ = partition[0](params)
            tx = optim.build_adamw(tr0, args.lr,
                                   weight_decay=args.weight_decay)
            state = TrainState.create(params, tx, jax.random.key(fold + 100),
                                      tx_params=tr0)
        else:
            tx = optim.build_adamw(params, args.lr,
                                   weight_decay=args.weight_decay)
            state = TrainState.create(params, tx, jax.random.key(fold + 100))
        step = clip_engine.make_clip_cls_train_step(
            model, tx, losses.softmax_ce, three_mod=args.three_mod,
            single_modality=sm, partition=partition)
        predict = clip_engine.make_clip_cls_predict_step(
            model, three_mod=args.three_mod, single_modality=sm)
        best_auc, best_epoch = -1.0, -1
        with mesh:
            for epoch in range(args.epochs):
                train_losses = []
                for b in batches(train_idx, shuffle_seed=(fold, epoch)):
                    y = b.pop("label")
                    b = {k: shard_batch(v, mesh) for k, v in b.items()}
                    b["label"] = y
                    state, m = step(state, b)
                    train_losses.append(float(m["loss"]))
                preds, trues = [], []
                for b in batches(val_idx):
                    y = b.pop("label")
                    preds.append(np.asarray(predict(state.params, b)))
                    trues.append(np.asarray(y))
                m = metrics_lib.compute_metrics(
                    "multi_cls", np.concatenate(trues), np.concatenate(preds))
                auc = m["macro_roc_ovr"]
                if auc > best_auc:
                    best_auc, best_epoch = auc, epoch
                    cdir = os.path.join(args.output_dir, f"ckpt_fold{fold}")
                    ckpt_lib.save_checkpoint(cdir, epoch, state,
                                             {"epoch": epoch}, keep_last=1,
                                             async_save=True)
                    registry_entries[fold] = {
                        "best_val": os.path.join(cdir, str(epoch)),
                        "best_test": os.path.join(cdir, str(epoch))}
                jsonl.write({"fold": fold, "epoch": epoch,
                             "train_loss": float(np.mean(train_losses)),
                             "val_auc_ovr": auc,
                             "val_acc": m["overall_acc"]})
        log.info(f"fold {fold}: best AUC {best_auc:.3f} @ {best_epoch}")
    ckpt_registry.save_ckpt_registry(
        os.path.join(args.output_dir, "cv_registry.json"), registry_entries)
    return registry_entries


# ----------------------------------------------------- manifest (GA growth)

def _main_manifest(args):
    import jax
    import jax.numpy as jnp

    from ..core import mesh as meshlib, ckpt_registry, checkpoint as ckpt_lib
    from ..data.multimodal import MODE_MAPPING, OCTFAFIRClsDataset
    from ..train import optim, losses, clip_engine
    from ..train.train_state import TrainState
    from ..train.mae_engine import shard_batch
    from ..train import metrics as metrics_lib
    from ..utils.logging import get_logger, JsonlLogger

    os.makedirs(args.output_dir, exist_ok=True)
    log = get_logger("retclip_cls", os.path.join(args.output_dir, "out.log"))
    task = args.task or "regression"
    mode = MODE_MAPPING.get(
        int(args.multimodal_type) if str(args.multimodal_type).isdigit()
        else args.multimodal_type, args.multimodal_type)
    three_mod = args.three_mod or mode == "oct3d_paired_faf_ir_cls"
    args.three_mod = three_mod
    label_keys = [k for k in (args.label_keys or "").split(",") if k]
    assert label_keys, "--label_keys required for manifest runs"

    num_outputs = len(label_keys) if task == "regression" else args.num_classes
    model, vcfg, ecfg = _build_model(args, num_outputs)
    if args.init_ckpt:
        # geometry guard BEFORE any fold trains: an enc8-trained retclip
        # checkpoint loads structurally-cleanly into 16-head towers and
        # silently computes the wrong function
        clip_engine.check_retclip_run_geometry(args.init_ckpt, vcfg, ecfg)
    three_mod = args.three_mod  # a 3-tower --model_config upgrades the run
    # 2D-vision configs (retfound2d/retfound3dhead) carry no num_frames;
    # default 60 like cli/retclip.py's reader
    frames, osz, esz = (vcfg.get("num_frames", 60), vcfg["img_size"],
                        ecfg["img_size"])

    def build_ds(csv):
        return OCTFAFIRClsDataset(
            csv, args.parent_dir, mode=mode, label_keys=label_keys,
            num_frames=frames, oct_size=osz, enface_size=esz,
            split_key=args.split_key, standardize=False)

    ds = build_ds(args.manifest_csv)
    ind_sets = [build_ds(p) for p in (args.independent_manifest_csv or [])]
    # fail at startup, not after a fold-epoch of training (eval_rows on an
    # empty set would np.concatenate([]) — review finding)
    for p, ind in zip(args.independent_manifest_csv or [], ind_sets):
        if len(ind) == 0:
            raise SystemExit(f"--independent_manifest_csv {p}: 0 usable rows")
    folds = ds.available_split[:args.k_folds]
    log.info(f"manifest: {len(ds)} rows, folds {folds}, "
             f"labels {label_keys}, mode {mode}, "
             f"{len(ind_sets)} independent test set(s)")

    sm = args.single_modality
    if three_mod and sm == "enface":
        sm = "enface1"
    criterion = (losses.mse_loss if task == "regression"
                 else losses.softmax_ce)
    metric_mode = ("multi_output_regression" if task == "regression"
                   else "multi_cls")

    mesh = meshlib.make_mesh()
    n_data = mesh.shape[meshlib.DATA_AXIS]
    batch = max(n_data, (args.batch_size // n_data) * n_data)

    def batches(dataset, rows, mu, sd, shuffle_seed=None,
                drop_last=True):
        rows = list(rows)
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(rows)
        stop = (len(rows) - batch + 1) if drop_last else len(rows)
        for s in range(0, max(stop, 0), batch):
            sel = rows[s:s + batch]
            if not drop_last and len(sel) < batch:
                sel = (sel * (batch // len(sel) + 1))[:batch]  # repeat-pad
            # dataset indexing stays 'all' (identity), so manifest row
            # numbers index the dataset directly
            samples = [dataset[i] for i in sel]
            vols = np.stack([x["image"] for x in samples])
            e1 = np.stack([x["enface1"] for x in samples])
            e2 = np.stack([x["enface2"] for x in samples])
            y = np.stack([x["label"] for x in samples]).astype(np.float32)
            if task == "regression":
                y = (y - mu) / sd
            else:
                y = y[:, 0].astype(np.int64)
            out = {"image": jnp.asarray(vols), "label": jnp.asarray(y)}
            if three_mod:
                out["enface1"] = jnp.asarray(e1)
                out["enface2"] = jnp.asarray(e2)
            else:
                # 2-tower: the enface side is FAF for mode 9, IR for 10
                out["enface"] = jnp.asarray(
                    e2 if mode == "oct3d_paired_faf_cls" else e1)
            yield out

    def eval_rows(predict, params, dataset, rows, mu, sd):
        preds, trues = [], []
        n_seen = 0
        for b in batches(dataset, rows, mu, sd, drop_last=False):
            y = b.pop("label")
            p = np.asarray(predict(params, b))
            take = min(batch, len(rows) - n_seen)
            preds.append(p[:take])
            trues.append(np.asarray(y)[:take])
            n_seen += take
        y_pred = np.concatenate(preds)
        y_true = np.concatenate(trues)
        return metrics_lib.compute_metrics(metric_mode, y_true, y_pred)

    # per-label ongoing-best collection (main_…_3mod.py:52-158): for each
    # label k and fold — best val r2_k, its epoch, and the independent
    # test metrics captured AT that epoch
    n_track = num_outputs if task == "regression" else 1
    collection = {
        "best_val": [[None] * len(folds) for _ in range(n_track)],
        "best_val_epoch": [[-1] * len(folds) for _ in range(n_track)],
        "independent_test_at_best_val": [
            [[None] * len(folds) for _ in range(n_track)]
            for _ in ind_sets],
    }
    registry_entries = {}
    jsonl = JsonlLogger(args.output_dir, "results.jsonl")

    for fi, fold in enumerate(folds):
        train_rows, val_rows = ds.cv_indices(fold)
        assert train_rows and val_rows, (fold, len(train_rows), len(val_rows))
        if len(train_rows) < batch:
            raise ValueError(
                f"fold {fold}: train side has {len(train_rows)} rows but "
                f"the device-rounded batch is {batch} — lower --batch_size "
                "or use fewer folds/devices")
        mu, sd = (ds.raw_label_stats(train_rows) if task == "regression"
                  else (0.0, 1.0))
        b0 = next(batches(ds, train_rows, mu, sd))
        y0 = b0.pop("label")  # noqa: F841  (init doesn't need labels)
        init_args = ((b0["image"], b0["enface1"], b0["enface2"])
                     if three_mod else (b0["image"], b0["enface"]))
        params = model.init(jax.random.key(fold), *init_args,
                            single_modality=sm)
        if args.init_ckpt:
            params, copied = clip_engine.init_towers_from_retclip(
                params, args.init_ckpt)
            log.info(f"fold {fold}: towers initialized from "
                     f"{args.init_ckpt} ({copied} tensors; "
                     "classification head fresh)")
        partition = _lock_partition(args, params, vcfg, log)
        if partition is not None:
            # optimizer over the trainable subtree only: frozen tower
            # params carry no moments and no backward
            tr0, _ = partition[0](params)
            tx = optim.build_adamw(tr0, args.lr,
                                   weight_decay=args.weight_decay)
            state = TrainState.create(params, tx, jax.random.key(fold + 100),
                                      tx_params=tr0)
        else:
            tx = optim.build_adamw(params, args.lr,
                                   weight_decay=args.weight_decay)
            state = TrainState.create(params, tx, jax.random.key(fold + 100))
        # orbax-restored tower params are committed to one device;
        # re-place on the mesh so they compose with sharded batches
        from ..train.mae_engine import replicate_state

        state = replicate_state(state, mesh)
        step = clip_engine.make_clip_cls_train_step(
            model, tx, criterion, three_mod=three_mod, single_modality=sm,
            partition=partition)
        predict = clip_engine.make_clip_cls_predict_step(
            model, three_mod=three_mod, single_modality=sm)

        primary = "r2_macro" if task == "regression" else "macro_roc_ovr"
        best_primary, best_epoch = -np.inf, -1
        with mesh:
            for epoch in range(args.epochs):
                train_losses = []
                for b in batches(ds, train_rows, mu, sd,
                                 shuffle_seed=(fold, epoch)):
                    y = b.pop("label")
                    b = {k: shard_batch(v, mesh) for k, v in b.items()}
                    b["label"] = y
                    state, m = step(state, b)
                    train_losses.append(float(m["loss"]))
                val_m = eval_rows(predict, state.params, ds, val_rows, mu, sd)
                ind_ms = [eval_rows(predict, state.params, d,
                                    list(range(len(d))), mu, sd)
                          for d in ind_sets]
                # per-label best-val update with independent-test capture
                for k in range(n_track):
                    key = f"r2_{k}" if task == "regression" else primary
                    prev = collection["best_val"][k][fi]
                    if prev is None or val_m[key] >= prev[key]:
                        collection["best_val"][k][fi] = val_m
                        collection["best_val_epoch"][k][fi] = epoch
                        for ti, im in enumerate(ind_ms):
                            collection["independent_test_at_best_val"][
                                ti][k][fi] = im
                if val_m[primary] > best_primary:
                    best_primary, best_epoch = val_m[primary], epoch
                    cdir = os.path.join(args.output_dir, f"ckpt_fold{fold}")
                    ckpt_lib.save_checkpoint(cdir, epoch, state,
                                             {"epoch": epoch}, keep_last=1,
                                             async_save=True)
                    registry_entries[fold] = {
                        "best_val": os.path.join(cdir, str(epoch)),
                        "best_test": os.path.join(cdir, str(epoch))}
                row = {"fold": int(fold), "epoch": epoch,
                       "train_loss": float(np.mean(train_losses)),
                       **{f"val_{k}": v for k, v in val_m.items()}}
                for ti, im in enumerate(ind_ms):
                    row.update({f"ind{ti}_{k}": v for k, v in im.items()})
                jsonl.write(row)
        log.info(f"fold {fold}: best {primary} {best_primary:.3f} "
                 f"@ epoch {best_epoch}")

    ckpt_registry.save_ckpt_registry(
        os.path.join(args.output_dir, "cv_registry.json"), registry_entries)
    summary = {
        "label_keys": label_keys, "folds": [int(f) for f in folds],
        "best_val": collection["best_val"],
        "best_val_epoch": collection["best_val_epoch"],
        "independent_test_at_best_val":
            collection["independent_test_at_best_val"],
    }
    with open(os.path.join(args.output_dir, "best_metrics.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    log.info("manifest fine-tune complete")
    return summary


if __name__ == "__main__":
    main()
