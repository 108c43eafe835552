"""Downstream fine-tune entry point (single-fold / k-fold).

Parity target: OCTCube/main_finetune_downstream_inhouse_singlefold.py
(SURVEY §3.2): model dispatch, pretrained-checkpoint load with head strip
+ pos-embed interpolation, layer-decay AdamW, per-epoch train/val/test
with best-AUC tracking and early stopping, metric CSVs.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


class SyntheticCls3D:
    def __init__(self, n, frames, size, n_label_cols, task_mode, seed=0):
        self.n, self.frames, self.size = n, frames, size
        self.n_label_cols = n_label_cols
        self.task_mode = task_mode
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng((self.seed, i))
        vol = rng.random((self.frames, self.size, self.size, 1), np.float32)
        if self.task_mode in ("multi_label",) or self.task_mode.startswith("multi_task"):
            lab = (rng.random(self.n_label_cols) > 0.5).astype(np.float32)
            if lab[1:].sum() > 0:
                lab[0] = 0.0
            else:
                lab[0] = 1.0
        elif self.task_mode == "regression":
            lab = rng.standard_normal(1).astype(np.float32)
        else:
            lab = np.int64(rng.integers(0, self.n_label_cols))
        return vol, lab


def build_model(cfg, dtype):
    from ..models import registry

    if cfg.model_family == "slivit":
        # slivit_baseline (ConvNeXt trunk, no drop_path knob in the
        # reference build, model_slivit_baseline.py:18-92) or *_slivit
        # (ViT-ST trunk + SLIViT head; the reference passes
        # drop_path_rate=args.drop_path into the trunk,
        # main_…diffmodal.py:1084-1095)
        kw = dict(num_classes=cfg.num_classes,
                  slivit_depth=cfg.slivit_depth, dtype=dtype)
        if cfg.model == "slivit_baseline":
            kw.update(num_frames=cfg.num_frames, img_size=cfg.input_size)
        else:
            kw.update(num_frames=cfg.num_frames,
                      t_patch_size=cfg.t_patch_size,
                      img_size=cfg.input_size, in_chans=cfg.in_chans,
                      drop_path_rate=cfg.drop_path)
        return registry.create_model("slivit", cfg.model, **kw)

    kw = dict(num_classes=cfg.num_classes, drop_path_rate=cfg.drop_path,
              dtype=dtype)
    if cfg.model_family in ("vit_st", "vit_st_dropout"):
        kw.update(num_frames=cfg.num_frames, t_patch_size=cfg.t_patch_size,
                  img_size=cfg.input_size, in_chans=cfg.in_chans,
                  global_pool=cfg.global_pool, sep_pos_embed=cfg.sep_pos_embed,
                  cls_embed=cfg.cls_embed,
                  # must match the pretrain encoder geometry (16 =
                  # reference ckpts, 8 = TPU-native-pretrained encoders)
                  num_heads=cfg.num_heads)
        if getattr(cfg, "variable_joint", False):
            # joint dual-res model: second 512² patch embed + pos embed
            # stored at the high-res grid (models_vit_st_joint_flash_attn
            # .py:74-120)
            kw.update(high_res_input_size=cfg.high_res_input_size)
    elif cfg.model_family == "vit_3dhead":
        kw.update(img_size=cfg.input_size, in_chans=cfg.in_chans,
                  global_pool=cfg.global_pool)
    else:  # vit2d
        kw.update(img_size=cfg.input_size, in_chans=cfg.in_chans,
                  global_pool=cfg.global_pool)
    return registry.create_model(cfg.model_family, cfg.model, **kw)


def run_fold(cfg, model, datasets, log, fold_tag=""):
    import jax
    import jax.numpy as jnp

    from ..core import mesh as meshlib, checkpoint as ckpt_lib
    from ..compat.torch_import import load_torch_checkpoint, import_state_dict
    from ..data import loader as loader_lib
    from ..train import optim, schedules, losses
    from ..train.train_state import TrainState
    from ..train.finetune_engine import (
        make_finetune_train_step, make_predict_step, BestTracker, evaluate,
        write_metric_csvs, write_confusion_matrices)
    from ..train.mae_engine import shard_batch
    from ..utils.logging import MetricLogger, JsonlLogger, TBWriter

    ds_train, ds_val, ds_test = datasets
    mesh = meshlib.make_mesh(n_data=cfg.n_data, n_fsdp=cfg.n_fsdp)
    n_data = mesh.shape[meshlib.DATA_AXIS]
    batch = min(cfg.batch_size, len(ds_train))
    if len(ds_train) < n_data:
        raise ValueError(f"train split has {len(ds_train)} items but the "
                         f"mesh needs a batch divisible by {n_data}")
    batch = max(n_data, (batch // n_data) * n_data)
    ld_tr = loader_lib.Loader(ds_train, batch, num_workers=4, seed=cfg.seed)
    assert len(ld_tr) > 0, "empty train loader (batch larger than dataset?)"
    ld_va = loader_lib.Loader(ds_val, batch, shuffle=False, drop_last=False,
                              num_workers=2)
    ld_te = loader_lib.Loader(ds_test, batch, shuffle=False, drop_last=False,
                              num_workers=2)

    sample, _ = ds_train[0]
    # variable_joint: the dataset yields (low_res, high_res) volume pairs
    # (PatientDataset_inhouse.py return_both_res_image); training alternates
    # the two streams through the joint model's resolution dispatch so both
    # patch embeds train.  The reference's own engine call is defective
    # (engine_finetune.py:433-435 passes the high-res batch as the
    # hidden_states flag) — this implements the documented intent instead.
    variable_joint = isinstance(sample, tuple)
    x0 = jnp.zeros((batch,) + (sample[0] if variable_joint else sample).shape)
    params = jax.jit(model.init)(jax.random.key(cfg.seed), x0)
    if cfg.finetune_ckpt:
        from ..compat.torch_import import check_geometry_stamp
        check_geometry_stamp(cfg.finetune_ckpt, cfg.num_heads)
        sd = load_torch_checkpoint(cfg.finetune_ckpt)
        # strip the head (reference strips mismatched heads, main:538-581)
        params, report = import_state_dict(params, sd, drop_keys=("head",),
                                           strict=False)
        log.info(f"loaded {cfg.finetune_ckpt}; new params: {report['missing']}")

    # reference eff_batch_size = batch * world_size (util/lr_sched.py via
    # main_finetune…singlefold.py); batch here is PER HOST, so multi-host
    # runs must scale by process_count like cli/pretrain.py does
    lr = schedules.scale_base_lr(cfg.blr, batch * jax.process_count())
    steps = max(1, len(ld_tr))
    sched = schedules.warmup_half_cosine(lr, cfg.min_lr, cfg.warmup_epochs,
                                         cfg.epochs, steps)
    tx = optim.build_adamw(params, sched, cfg.weight_decay,
                           layer_decay=cfg.layer_decay,
                           num_blocks=getattr(model, "depth", 24),
                           clip_grad=cfg.clip_grad)
    state = TrainState.create(params, tx, jax.random.key(cfg.seed + 1))

    crit = losses.make_criterion(cfg.task_mode, smoothing=cfg.smoothing,
                                 use_focal=cfg.use_focal)
    step_fn = make_finetune_train_step(model, tx, crit)
    predict = make_predict_step(model)
    tracker = BestTracker(patience=cfg.early_stop_patience)
    jsonl = JsonlLogger(cfg.output_dir, f"log{fold_tag}.txt")
    # epoch_1000x-convention TensorBoard scalars (engine_finetune.py:471-477)
    tb = TBWriter(os.path.join(cfg.output_dir, f"tb{fold_tag}"))
    ckpt_dir = os.path.join(cfg.output_dir, f"ckpt{fold_tag}")

    def eval_batches(ld):
        for x, y in ld:
            if variable_joint:
                x = x[1]  # evaluate on the high-res stream
            yield jnp.asarray(x), y

    best_test = None
    with mesh:
        for epoch in range(cfg.epochs):
            ld_tr.set_epoch(epoch)
            meter = MetricLogger()
            n_nan = 0
            # one-step-deep pipeline: read step t-1's metrics after
            # dispatching step t, so host batch prep overlaps the device
            # step (the float()/bool() reads are the sync points; the
            # engine's in-jit NaN revert keeps correctness independent of
            # when the host observes "finite")
            pending = None
            for it, (x, y) in enumerate(
                    meter.log_every(ld_tr, 10, f"Epoch [{epoch}]{fold_tag}",
                                    logger=log)):
                if variable_joint:
                    x = x[(epoch + it) % 2]  # alternate low/high-res streams
                b = shard_batch(jnp.asarray(x), mesh)
                state, m = step_fn(state, b, jnp.asarray(y))
                if pending is not None:
                    ok = bool(pending["finite"])
                    n_nan += 0 if ok else 1
                    meter.update(loss=float(pending["loss"]) if ok else 0.0)
                pending = m
            if pending is not None:
                ok = bool(pending["finite"])
                n_nan += 0 if ok else 1
                meter.update(loss=float(pending["loss"]) if ok else 0.0)
            val_metrics, _, _ = evaluate(predict, state.params,
                                         eval_batches(ld_va), cfg.task_mode)
            improved = tracker.update(epoch, val_metrics)
            record = {"epoch": epoch,
                      "train_loss": meter.meters["loss"].global_avg,
                      "val_auc": val_metrics.get("roc", {}).get("macro"),
                      "nan_steps": n_nan, "best": improved}
            if improved:
                ckpt_lib.save_checkpoint(ckpt_dir, epoch, state,
                                         {"epoch": epoch}, keep_last=1,
                                         async_save=True)
                test_metrics, yt, yp = evaluate(predict, state.params,
                                                eval_batches(ld_te),
                                                cfg.task_mode)
                tracker.best_test_metrics = test_metrics
                best_test = test_metrics
                write_metric_csvs(val_metrics, cfg.output_dir, f"val{fold_tag}")
                write_metric_csvs(test_metrics, cfg.output_dir, f"test{fold_tag}")
                # confusion-matrix images per eval (pycm equivalent,
                # engine_finetune.py:766-776)
                write_confusion_matrices(yt, yp, cfg.task_mode,
                                         cfg.output_dir, f"test{fold_tag}")
                record["test_auc"] = test_metrics.get("roc", {}).get("macro")
            jsonl.write(record)
            tb.scalar("train_loss", record["train_loss"], epoch + 1)
            if record.get("val_auc") is not None:
                tb.scalar("val_auc", record["val_auc"], epoch + 1)
            tb.flush()
            log.info(f"epoch {epoch}: {record}")
            if tracker.should_stop:
                log.info(f"early stop at epoch {epoch}")
                break
    return tracker, best_test


def main(argv=None):
    parser = argparse.ArgumentParser("OCTCube-TPU downstream fine-tune")
    parser.add_argument("--preset", default="octcube_multitask")
    parser.add_argument("--data_dir", default=None)
    parser.add_argument("--labels_csv", default=None,
                        help="CSV with patient_id + disease columns "
                             "(data/patients.attach_labels_from_csv)")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic_n", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--k_folds", type=int, default=None)
    parser.add_argument("--variable_joint", action="store_true", default=None)
    parser.add_argument("--slivit_dataset", choices=["ct3d", "us3d"],
                        default=None,
                        help="SLIViT cross-modality data (main_…diffmodal.py "
                             "--slivit_dataset): ct3d = nodulemnist3d.npz at "
                             "--data_dir; us3d = EchoNet root at --data_dir")
    parser.add_argument("--num_heads", type=int, default=None,
                        help="encoder heads — must match the pretrain "
                             "geometry of finetune_ckpt (16 = reference "
                             "checkpoints, 8 = vitl_mae_tpu_native_enc8 "
                             "pretrains); the param tree is identical, so "
                             "a mismatch loads cleanly but computes the "
                             "wrong function")
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import dataclasses

    from ..core import multihost
    multihost.announce()

    from ..core.config import FinetuneConfig, load_config, to_json
    from ..data import patients, transforms
    from ..utils.logging import get_logger

    if args.slivit_dataset and args.preset == "octcube_multitask":
        args.preset = f"slivit_{args.slivit_dataset}"  # canonical preset
    overrides = {k: v for k, v in (
        ("epochs", args.epochs), ("batch_size", args.batch_size),
        ("output_dir", args.output_dir), ("k_folds", args.k_folds),
        ("variable_joint", args.variable_joint),
        ("num_heads", args.num_heads),
        ("slivit_dataset", args.slivit_dataset))
        if v is not None}
    cfg = load_config(FinetuneConfig, args.preset, **overrides)
    if args.tiny:
        cfg = dataclasses.replace(
            cfg, num_frames=6, input_size=32, num_classes=6,
            high_res_input_size=64, disease_list=("AMD", "DME", "POG"))
        if cfg.slivit_dataset:
            # trunk stride is 32, so slices stay >= 32px; shrink the
            # ConvNeXt + head depths instead of the geometry
            cfg = dataclasses.replace(
                cfg, num_frames=4, num_classes=2 if
                cfg.slivit_dataset == "ct3d" else 1, slivit_depth=1,
                disease_list=("nodule",) if cfg.slivit_dataset == "ct3d"
                else ("EF",),
                task_mode="multi_cls" if cfg.slivit_dataset == "ct3d"
                else "regression")
    os.makedirs(cfg.output_dir, exist_ok=True)
    log = get_logger("finetune", os.path.join(cfg.output_dir, "out.log"))
    with open(os.path.join(cfg.output_dir, "args.json"), "w") as f:
        f.write(to_json(cfg))

    dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    if args.tiny and cfg.slivit_dataset:
        from ..models.slivit import SLIViT
        model = SLIViT(num_patches=cfg.num_frames,
                       num_classes=cfg.num_classes,
                       slice_size=cfg.input_size, vit_depth=cfg.slivit_depth,
                       convnext_depths=(1, 1, 1, 1),
                       convnext_dims=(8, 8, 8, 16), dtype=dtype)
    elif args.tiny:
        from ..models.vit_st import VisionTransformerST
        model = VisionTransformerST(
            num_frames=cfg.num_frames, t_patch_size=3, img_size=cfg.input_size,
            in_chans=1, num_classes=cfg.num_classes, embed_dim=32, depth=2,
            num_heads=2, dtype=dtype, attn_impl="auto",
            high_res_input_size=(cfg.high_res_input_size
                                 if cfg.variable_joint else None))
    else:
        model = build_model(cfg, dtype)

    # ---- datasets
    if cfg.slivit_dataset is not None and args.data_dir is not None:
        # SLIViT cross-modality experiments (main_…diffmodal.py
        # --slivit_exp): predefined train/val/test splits, single fold
        from ..data import crossmodal
        if cfg.slivit_dataset == "ct3d":
            mk = lambda split: crossmodal.MedMNIST3DDataset(
                args.data_dir, split, num_frames=cfg.num_frames,
                input_size=cfg.input_size)
            folds = [(mk("train"), mk("val"), mk("test"))]
        else:  # us3d: EchoNet EF regression
            mk = lambda split: crossmodal.EchoNetDataset(
                args.data_dir, split, num_frames=cfg.num_frames,
                input_size=cfg.input_size)
            folds = [(mk("TRAIN"), mk("VAL"), mk("TEST"))]
    elif args.synthetic or args.data_dir is None:
        n_cols = 1 + len(cfg.disease_list)
        full = SyntheticCls3D(args.synthetic_n, cfg.num_frames,
                              cfg.input_size, n_cols, cfg.task_mode)
        n = len(full)
        idx = np.arange(n)
        mk = lambda lo, hi: [full[i] for i in idx[lo:hi]]

        class Slice:
            def __init__(self, items):
                self.items = items

            def __len__(self):
                return len(self.items)

            def __getitem__(self, i):
                return self.items[i]

        folds = [(Slice(mk(0, n * 6 // 10)), Slice(mk(n * 6 // 10, n * 8 // 10)),
                  Slice(mk(n * 8 // 10, n)))]
    else:
        visits = patients.scan_directory(args.data_dir)
        if args.labels_csv:
            visits = patients.attach_labels_from_csv(visits, args.labels_csv)
            log.info(f"{len(visits)} visits matched {args.labels_csv}")
        _, label_fn = patients.build_labels(visits, cfg.task_mode,
                                            disease_list=cfg.disease_list)
        tr_t, va_t = transforms.create_3d_transforms(cfg.input_size,
                                                     cfg.num_frames)
        hi_tr = hi_va = None
        if cfg.variable_joint:
            # dual-res transforms (main_…singlefold.py:269-276: high-res
            # factory with normalize=False)
            hi_frames = cfg.high_res_num_frames or cfg.num_frames
            hi_tr, hi_va = transforms.create_3d_transforms(
                cfg.high_res_input_size, hi_frames)
        folds = []
        for fold in range(max(1, cfg.k_folds)):
            trv, vav, tev = patients.kfold_patient_split(
                visits, max(2, cfg.k_folds), fold, seed=cfg.seed)
            mk3 = lambda vs, t, hi: patients.PatientDataset3D(
                vs, label_fn, max_frames=cfg.num_frames, transform=t,
                return_both_res_image=cfg.variable_joint,
                high_res_transform=hi,
                high_res_max_frames=cfg.high_res_num_frames or cfg.num_frames)
            folds.append((mk3(trv, tr_t, hi_tr), mk3(vav, va_t, hi_va),
                          mk3(tev, va_t, hi_va)))

    results = []
    for fold, datasets in enumerate(folds):
        tag = f"_fold{fold}" if len(folds) > 1 else ""
        tracker, test_metrics = run_fold(cfg, model, datasets, log, tag)
        results.append((tracker.best_auc, tracker.best_epoch))
        log.info(f"fold {fold}: best val AUC {tracker.best_auc:.4f} "
                 f"@ epoch {tracker.best_epoch}")
    return results


if __name__ == "__main__":
    main()
