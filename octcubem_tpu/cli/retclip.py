"""Contrastive (retinal-COEM) training entry point.

Parity target: retinal-COEM/src/training/main_retclip.py (SURVEY §3.3)
and main_retclip_3modalities.py: tower init from pretrained checkpoints,
LiT image-tower locking, per-step cosine LR, CLIP loss over the mesh,
per-epoch retrieval eval, results.jsonl + retrieval pkl dump.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import pickle

import numpy as np


class SyntheticPairs:
    """OCT volume + enface image pairs (+ optional FAF with presence
    weights), the synthetic analogue of training/data.py:1036-1078."""

    def __init__(self, n, frames, oct_size, enf_size, three_mod=False, seed=0):
        self.n, self.frames = n, frames
        self.oct_size, self.enf_size = oct_size, enf_size
        self.three_mod = three_mod
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng((self.seed, i))
        # paired samples share a latent pattern so retrieval can learn
        latent = rng.random((8, 8, 1), np.float32)
        up = np.kron(latent, np.ones((self.oct_size // 8, self.oct_size // 8, 1),
                                     np.float32))
        vol = np.repeat(up[None], self.frames, axis=0) \
            + 0.1 * rng.random((self.frames, self.oct_size, self.oct_size, 1),
                               np.float32)
        upe = np.kron(latent, np.ones((self.enf_size // 8, self.enf_size // 8, 1),
                                      np.float32))
        enf = np.repeat(upe, 3, axis=-1) \
            + 0.1 * rng.random((self.enf_size, self.enf_size, 3), np.float32)
        if self.three_mod:
            faf = enf[::-1].copy()
            w = np.float32(rng.random() > 0.3)  # FAF present 70% of the time
            return vol.astype(np.float32), enf.astype(np.float32), faf, w
        return vol.astype(np.float32), enf.astype(np.float32)


class _Subset:
    def __init__(self, ds, idx):
        self.ds, self.idx = ds, list(idx)

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, i):
        return self.ds[self.idx[i]]


def _split_train_val(ds, val_frac: float = 0.2, seed: int = 0):
    """Patient-level train/val split (reuses the kfold grouping idea,
    data/patients.py::kfold_patient_split): all of a patient's visits go
    to the same side so retrieval is measured on unseen patients.
    Datasets without patient structure (synthetic) split by index."""
    records = getattr(ds, "records", None)
    if records is not None:
        import dataclasses as _dc

        pids = sorted({r.visit.patient_id for r in records})
        rng = np.random.default_rng(seed)
        n_val = max(1, int(len(pids) * val_frac))
        val_ids = set(np.asarray(pids)[rng.permutation(len(pids))[:n_val]])
        tr = [r for r in records if r.visit.patient_id not in val_ids]
        va = [r for r in records if r.visit.patient_id in val_ids]
        return (_dc.replace(ds, records=tr), _dc.replace(ds, records=va))
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ds))
    n_val = max(1, int(len(ds) * val_frac))
    return _Subset(ds, perm[n_val:]), _Subset(ds, perm[:n_val])


def main(argv=None):
    parser = argparse.ArgumentParser("OCTCube-TPU retclip training")
    parser.add_argument("--preset", default="octcube_ir")
    parser.add_argument("--model_config", default=None,
                        help="COEM JSON config name/path (models/configs)")
    parser.add_argument("--data_dir", default=None, action="append",
                        help="paired OCT/IR(/FAF) tree (docs/DATA.md); "
                             "repeatable — multiple roots are concatenated "
                             "behind one loader (AggregatedDataset, "
                             "multimodal_dataset.py:538)")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic_n", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--evaluate_only", action="store_true")
    parser.add_argument("--save_retrieval_results", action="store_true")
    parser.add_argument("--resume", default=None,
                        help="'latest' restores the full TrainState from "
                             "output_dir/ckpt")
    parser.add_argument("--opt_chain", action="store_true",
                        help="legacy optax.chain optimizer layout (resume "
                             "pre-fused-AdamW checkpoints)")
    parser.add_argument("--wandb", action="store_true",
                        help="log to Weights & Biases if installed "
                             "(main_retclip.py:288-308); no-op otherwise")
    parser.add_argument("--wandb_project_name", default="octcubem")
    parser.add_argument("--resume_params_only", action="store_true",
                        help="restore params only (fresh optimizer) — "
                             "works across optimizer-layout changes")
    # serving parity for the retrieval path (mirrors cli/predict.py's
    # --quant/--export_aot/--aot for the classifier): frozen AOT
    # artifacts + int8 PTQ for the COEM tower encoders
    parser.add_argument("--quant", default="none", choices=["none", "int8"],
                        help="int8-quantize the tower encoders for "
                             "evaluation/export (ops/quant.py PTQ; "
                             "training always runs full precision)")
    parser.add_argument("--export_aot", default=None,
                        help="write a frozen retrieval-encoder artifact "
                             "(weights baked in, honoring --quant) to "
                             "this path and exit; resume/--model_config "
                             "decide the weights")
    parser.add_argument("--aot", default=None,
                        help="with --evaluate_only: encode with a frozen "
                             "artifact from --export_aot instead of the "
                             "live model")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..core import multihost
    multihost.announce()

    from ..core.config import RetClipConfig, load_config, to_json
    from ..core import mesh as meshlib, checkpoint as ckpt_lib
    from ..models import registry, coem
    from ..compat.torch_import import (load_torch_checkpoint,
                                       import_state_dict,
                                       check_geometry_stamp)
    from ..data import loader as loader_lib
    from ..train import optim, schedules, clip_engine
    from ..train.train_state import TrainState
    from ..train.mae_engine import shard_batch
    from ..utils.logging import (MetricLogger, JsonlLogger, get_logger,
                                 Throughput, TBWriter)

    overrides = {k: v for k, v in (
        ("epochs", args.epochs), ("batch_size", args.batch_size),
        ("output_dir", args.output_dir), ("resume", args.resume))
        if v is not None}
    if args.evaluate_only:
        overrides["evaluate_only"] = True
    if args.opt_chain:
        overrides["opt_chain"] = True
    if args.resume_params_only:
        overrides["resume_params_only"] = True
    cfg = load_config(RetClipConfig, args.preset, **overrides)
    os.makedirs(cfg.output_dir, exist_ok=True)
    log = get_logger("retclip", os.path.join(cfg.output_dir, "out.log"))
    dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    if args.model_config:
        model = registry.create_coem_model(args.model_config, dtype=dtype,
                                           remat=cfg.grad_checkpointing)
        vcfg = model.vision_cfg or {}
        ecfg = model.enface_cfg or {}
    else:
        vcfg, ecfg = dict(cfg.vision_cfg), dict(cfg.enface_cfg)
        cls = coem.COEP3Tower if cfg.three_mod else coem.COEP2Tower
        model = cls(embed_dim=cfg.embed_dim, vision_cfg=vcfg,
                    enface_cfg=ecfg, dtype=dtype,
                    remat=cfg.grad_checkpointing)
    three_mod = isinstance(model, coem.COEP3Tower)
    # params.txt must record the AS-BUILT tower geometry: with
    # --model_config the towers come from the JSON registry, not the
    # preset's vision_cfg/enface_cfg, and every geometry consumer
    # (check_resume_geometry below, check_retclip_run_geometry on the
    # cls-fine-tune side) trusts this file.  Recording the preset cfg
    # here made params.txt lie for --model_config runs (caught by the
    # GA-growth e2e smoke: tiny 2-head towers recorded as 16-head).
    cfg = dataclasses.replace(
        cfg, model=(args.model_config or cfg.model),
        embed_dim=model.embed_dim, three_mod=three_mod,
        vision_cfg=dict(vcfg), enface_cfg=dict(ecfg))
    # tower-geometry guard BEFORE params.txt is overwritten: --resume
    # latest restores from THIS dir, and a head-repartitioned (or
    # otherwise re-shaped) tower would load cleanly and silently train a
    # different function (core/config.check_resume_geometry).  Compares
    # as-built geometry, so --model_config runs are guarded too.
    if cfg.resume == "latest":
        from ..core.config import check_resume_geometry

        check_resume_geometry(
            cfg, os.path.join(cfg.output_dir, "params.txt"),
            ("model", "embed_dim", "three_mod", "vision_cfg", "enface_cfg"))
    with open(os.path.join(cfg.output_dir, "params.txt"), "w") as f:
        f.write(to_json(cfg))

    frames = vcfg.get("num_frames", 60)
    osize = vcfg.get("img_size", 256)
    esize = ecfg.get("img_size", 384)

    if args.data_dir:
        from ..data.multimodal import (AggregatedPairedDataset,
                                       PairedOCTEnfaceDataset,
                                       scan_paired_directory)

        sources = []
        for root in args.data_dir:
            d = PairedOCTEnfaceDataset(
                scan_paired_directory(root), num_frames=frames,
                oct_size=osize, enface_size=esize)
            if len(d) == 0:
                raise ValueError(
                    f"no paired OCT+IR visits found under {root} "
                    "(expected patient/visit dirs with oct_*.png + ir.png — "
                    "see docs/DATA.md)")
            sources.append(d)
        ds = (sources[0] if len(sources) == 1
              else AggregatedPairedDataset(sources))
    else:
        ds = SyntheticPairs(args.synthetic_n, frames, osize, esize, three_mod)

    # patient-level train/val split: retrieval is evaluated on HELD-OUT
    # pairs only (reference main_retclip.py:270 + train_retclip.py:243-249
    # evaluate a separate val loader, never the train set).  Aggregated
    # multi-source data splits per source, so every source contributes to
    # both sides and dataset_idx stays stable across the split.
    if args.data_dir and len(args.data_dir) > 1:
        halves = [_split_train_val(d, val_frac=0.2, seed=cfg.seed)
                  for d in ds.datasets]
        ds_train = AggregatedPairedDataset([h[0] for h in halves])
        ds_val = AggregatedPairedDataset([h[1] for h in halves])
    else:
        ds_train, ds_val = _split_train_val(ds, val_frac=0.2, seed=cfg.seed)
    log.info(f"train/val pairs: {len(ds_train)}/{len(ds_val)}")

    mesh = meshlib.make_mesh(n_data=cfg.n_data, n_fsdp=cfg.n_fsdp)
    n_data = mesh.shape[meshlib.DATA_AXIS]
    batch = max(n_data, (cfg.batch_size // n_data) * n_data)
    # feature-cached grad accumulation (train_retclip.py:131-168): the
    # loader serves accum_freq chunks per step; effective batch is
    # batch * accum_freq
    accum = max(1, cfg.accum_freq)
    ld = loader_lib.Loader(ds_train, batch * accum, num_workers=4,
                           seed=cfg.seed)
    ld_eval = loader_lib.Loader(ds_val, batch, shuffle=False, drop_last=False,
                                num_workers=2)

    def to_batch(items):
        if isinstance(items, dict):  # PairedOCTEnfaceDataset batches
            b = {k: jnp.asarray(v) for k, v in items.items()
                 if k not in ("__key__", "label")}
            if not three_mod:
                return {"image": b["image"], "enface": b["enface1"]}
            return {"image": b["image"], "enface1": b["enface1"],
                    "enface2": b["enface2"], "weight1": b["weight1"],
                    "weight2": b["weight2"]}
        if three_mod:
            vol, enf, faf, w = items
            return {"image": jnp.asarray(vol), "enface1": jnp.asarray(enf),
                    "enface2": jnp.asarray(faf),
                    "weight1": jnp.ones(len(vol)), "weight2": jnp.asarray(w)}
        vol, enf = items
        return {"image": jnp.asarray(vol), "enface": jnp.asarray(enf)}

    ex = to_batch(next(iter(ld_eval)))
    init_args = ((ex["image"], ex["enface1"], ex["enface2"]) if three_mod
                 else (ex["image"], ex["enface"]))
    params = jax.jit(model.init)(jax.random.key(cfg.seed), *init_args)

    # tower init from pretrained torch checkpoints (factory.py tower loads,
    # open_clip/model.py:271-295).  Geometry-stamp guard first: the
    # attention tensors are shape-identical across head partitionings, so
    # a stamped enc8 .pth would load cleanly into a 16-head tower and
    # silently train the wrong function (same hazard class the
    # finetune/infer/predict/serve consumers already refuse).
    for ckpt_path, prefix, heads in (
            (cfg.visual_init_ckpt, "visual/trunk", vcfg.get("num_heads", 16)),
            (cfg.enface_init_ckpt, "enface/trunk", ecfg.get("num_heads", 16))):
        if ckpt_path:
            check_geometry_stamp(ckpt_path, heads)
            sd = load_torch_checkpoint(ckpt_path)
            sd = {f"{prefix}.{k}".replace("/", "."): v for k, v in sd.items()}
            params, rep = import_state_dict(params, sd, strict=False,
                                            drop_keys=("head",))
            log.info(f"initialized {prefix} from {ckpt_path}")

    # LiT locking: freeze the visual trunk except the last
    # `lock_image_unlocked_groups` groups — [... blocks, last block+norm,
    # head group] ordering per the reference lock()
    # (models_vit_st_flash_attn_nodrop.py:308-351).  Default lock_mode
    # 'partition' is REAL freezing: grads are taken over the trainable
    # split only (no frozen backward) and the optimizer carries no
    # moments for frozen params; 'zero_scale' keeps the legacy
    # zero-scaled-update fallback.
    trainable_scales = None
    partition = None
    # guard on the PARAM tree, not the module: flax assigns .visual in
    # setup(), so hasattr(model, "visual") is False on the unbound
    # module and would silently skip locking (the round-3 review caught
    # this exact no-op one layer above the round-2 one)
    has_visual = "visual" in params.get("params", params)
    if cfg.lock_image and has_visual:
        # shared mask builder (optim.lit_lock_scales) — it strips the
        # 'params/' root before matching, which the round-2 inline mask
        # did not, silently unlocking everything
        scales = optim.lit_lock_scales(params, vcfg.get("depth", 24),
                                       cfg.lock_image_unlocked_groups)
        if cfg.lock_mode == "zero_scale":
            trainable_scales = scales
        else:
            partition = optim.make_partition(
                jax.tree.map(lambda s: s > 0, scales))
        n_frozen = sum(int(s == 0) for s in jax.tree.leaves(scales))
        log.info(f"LiT lock ({cfg.lock_mode}): {n_frozen} frozen param "
                 f"tensors, {cfg.lock_image_unlocked_groups} unlocked groups")

    steps_per_epoch = max(1, len(ld))
    sched = schedules.clip_cosine_lr(cfg.lr, cfg.warmup_steps,
                                     cfg.epochs * steps_per_epoch)
    if partition is not None:
        tr0, _ = partition[0](params)
        tx = optim.build_adamw(tr0, sched, cfg.weight_decay,
                               betas=(0.9, 0.98), force_chain=cfg.opt_chain)
        state = TrainState.create(params, tx, jax.random.key(cfg.seed + 1),
                                  tx_params=tr0)
    else:
        tx = optim.build_adamw(params, sched, cfg.weight_decay,
                               betas=(0.9, 0.98), force_chain=cfg.opt_chain)
        if trainable_scales is not None:
            import optax
            tx = optax.chain(tx, optim.scale_by_tree(trainable_scales))
        state = TrainState.create(params, tx, jax.random.key(cfg.seed + 1))
    start_epoch = 0
    ckpt_dir = os.path.join(cfg.output_dir, "ckpt")
    if cfg.resume == "latest" and ckpt_lib.latest_step(ckpt_dir) is not None:
        from ..train.mae_engine import replicate_state

        if cfg.resume_params_only:
            # layout-proof resume: params only, fresh optimizer/epoch —
            # works across opt_chain / lock_mode / fused-AdamW changes
            raw_prev, step_prev = ckpt_lib.restore_raw(ckpt_dir)
            params_prev = jax.tree.map(
                lambda t, s: jnp.asarray(s, t.dtype), state.params,
                raw_prev["params"])
            state = state.replace(params=params_prev)
            log.info(f"params restored from {ckpt_dir} (step {step_prev}); "
                     "optimizer reset (resume_params_only)")
        else:
            try:
                state, extra, _ = ckpt_lib.restore_checkpoint(ckpt_dir, state)
            except Exception as e:
                raise SystemExit(
                    f"resume failed against the current optimizer layout "
                    f"({e}).  Checkpoints written under a different "
                    f"optimizer/lock configuration need a matching build: "
                    f"--opt_chain for pre-fused-AdamW runs, the saved run's "
                    f"lock_mode, or --resume_params_only to restore params "
                    f"with a fresh optimizer.") from e
            start_epoch = (extra or {}).get("epoch", 0) + 1
            log.info(f"resumed from epoch {start_epoch - 1}")
        state = replicate_state(state, mesh)
    # -------- retrieval serving path: int8 encoders / AOT artifacts ----
    def _quant_encoder():
        """The towers rebuilt with QuantDense + int8-converted params —
        the same offline PTQ the classifier serving path uses
        (ops/quant.py; NOTES_ROUND3 int8 section)."""
        from ..ops.quant import quantize_tree

        if args.model_config:
            qmodel = registry.create_coem_model(args.model_config,
                                                dtype=dtype, quant=True)
        else:
            qmodel = cls(embed_dim=cfg.embed_dim, vision_cfg=vcfg,
                         enface_cfg=ecfg, dtype=dtype, quant=True)
        qparams = jax.jit(
            lambda p: {"params": quantize_tree(p["params"])})(state.params)
        return qmodel, qparams

    encode_fn = None
    if args.export_aot:
        from ..compat.aot import export_serving_artifact

        if args.quant == "int8":
            m_exp, p_exp = _quant_encoder()
        else:
            m_exp, p_exp = model, state.params
        n_feat = 3 if three_mod else 2
        fn = (lambda i, a, b: m_exp.apply(p_exp, i, a, b)[:3]) if three_mod \
            else (lambda i, e: m_exp.apply(p_exp, i, e)[:2])
        export_serving_artifact(
            fn, init_args, args.export_aot,
            meta={"kind": "coem_retrieval_encoder", "three_mod": three_mod,
                  "quant": args.quant, "embed_dim": cfg.embed_dim})
        log.info(f"retrieval encoder artifact written to {args.export_aot} "
                 f"({n_feat} features, quant={args.quant})")
        return args.export_aot
    if args.aot:
        from ..compat.aot import load_serving_artifact

        aot_fn, aot_meta = load_serving_artifact(args.aot)
        if bool(aot_meta.get("three_mod")) != three_mod:
            raise SystemExit(
                f"--aot artifact is three_mod={aot_meta.get('three_mod')} "
                f"but this run is three_mod={three_mod}")
        b_art = aot_meta["in_shapes"][0][0]

        def encode_fn(*xs):
            # AOT programs are static-shape: repeat-pad a short final
            # eval batch up to the artifact batch, truncate the features
            n = xs[0].shape[0]
            if n > b_art:
                raise SystemExit(
                    f"eval batch {n} exceeds the artifact batch {b_art}; "
                    "re-export with a larger batch or lower --batch_size")
            if n < b_art:
                xs = tuple(jnp.concatenate(
                    [x] + [x[:1]] * (b_art - n)) for x in xs)
            return tuple(o[:n] for o in aot_fn(*xs))

        log.info(f"encoding with frozen artifact {args.aot} "
                 f"(quant={aot_meta.get('quant')})")
    elif args.quant == "int8":
        qmodel, qparams = _quant_encoder()
        encode_fn = (jax.jit(lambda i, a, b: qmodel.apply(qparams, i, a, b)[:3])
                     if three_mod
                     else jax.jit(lambda i, e: qmodel.apply(qparams, i, e)[:2]))
        log.info("encoding with live int8-quantized towers")
    if encode_fn is not None and not cfg.evaluate_only:
        raise SystemExit("--aot/--quant encoders are evaluation-only "
                         "(use --evaluate_only); training runs full "
                         "precision")

    if accum > 1:
        step_fn = (clip_engine.make_clip_accum_train_step_3mod(
                       model, tx, accum, partition=partition)
                   if three_mod
                   else clip_engine.make_clip_accum_train_step(
                       model, tx, accum, partition=partition))
    else:
        step_fn = clip_engine.make_clip_train_step(model, tx,
                                                   three_mod=three_mod,
                                                   partition=partition)
    jsonl = JsonlLogger(cfg.output_dir, "results.jsonl")
    # --report-to tensorboard equivalent (main_retclip.py:283-308)
    tb = TBWriter(os.path.join(cfg.output_dir, "tb"))
    # --wandb equivalent (main_retclip.py:288-308): import-guarded; a
    # silent no-op where the package is absent (this image)
    from ..utils.logging import WandbWriter
    wandb_w = WandbWriter(args.wandb, cfg.output_dir,
                          project=args.wandb_project_name,
                          name=os.path.basename(cfg.output_dir) or "retclip",
                          config=dataclasses.asdict(cfg))

    def eval_epoch(epoch):
        # one pass over the val loader: jnp batches for the metric
        # computation + row-aligned keys harvested as we go (the raw
        # host arrays are NOT retained)
        save = args.save_retrieval_results or cfg.save_retrieval_results
        batches, keys = [], []
        for b in ld_eval:
            batches.append(to_batch(b))
            if isinstance(b, dict) and "__key__" in b:
                keys.extend(b["__key__"])
        result = clip_engine.evaluate_retrieval(
            model, state.params, batches, three_mod=three_mod,
            return_features=save, encode_fn=encode_fn)
        metrics, features = result if save else (result, None)
        jsonl.write({"epoch": epoch, **metrics})
        if save:
            # feature bank for the offline evaluator
            # (cli/retrieval_eval.py; reference train_retclip.py:373-395).
            # Row-aligned item keys + source paths ride along so the
            # evaluator can reload images and render top-3 panels
            # (retDisease_eval/…top3_col_aireadi_laterality.py:61-114).
            payload = {"metrics": metrics, **features}
            if keys:
                payload["keys"] = keys
                recs = (ds_val.key_to_record()
                        if hasattr(ds_val, "key_to_record") else
                        {f"{r.visit.patient_id}/{r.visit.visit_id}": r
                         for r in getattr(ds_val, "records", [])})
                payload["paths"] = {
                    k: {"oct": recs[k].visit.frames[0],
                        "enface1": recs[k].ir_path,
                        "enface2": recs[k].faf_path}
                    for k in keys if k in recs}
            with open(os.path.join(cfg.output_dir,
                                   f"retrieval_results_{epoch}.pkl"), "wb") as f:
                pickle.dump(payload, f)
        return metrics

    if cfg.evaluate_only:
        m = eval_epoch(0)
        log.info(f"eval-only: {m}")
        wandb_w.finish()
        return m

    with mesh:
        for epoch in range(start_epoch, cfg.epochs):
            ld.set_epoch(epoch)
            meter = MetricLogger()
            tput = Throughput()
            pending = None  # one-step-deep dispatch pipeline
            for items in meter.log_every(ld, 10, f"Epoch [{epoch}]", logger=log):
                b = to_batch(items)
                if accum > 1:
                    from ..train.mae_engine import shard_microbatch

                    b = {k: shard_microbatch(
                            v.reshape((accum, batch) + v.shape[1:]), mesh)
                         for k, v in b.items()}
                else:
                    b = {k: shard_batch(v, mesh) for k, v in b.items()}
                state, m = step_fn(state, b)
                # read step t-1's loss after dispatching step t: the
                # float() is the sync point, so batch prep (multimodal
                # decode + collate) overlaps the device step
                if pending is not None:
                    meter.update(loss=float(pending["loss"]))
                pending = m
                tput.update(batch * accum)
            if pending is not None:
                meter.update(loss=float(pending["loss"]))
            metrics = eval_epoch(epoch)
            if (epoch + 1) % cfg.save_frequency == 0:
                ckpt_lib.save_checkpoint(ckpt_dir, epoch, state,
                                         {"epoch": epoch},
                                         keep_last=cfg.keep_last,
                                         async_save=True)
            tb.scalar("train_loss", meter.meters["loss"].global_avg,
                      epoch + 1)
            for mk, mv in metrics.items():
                if isinstance(mv, (int, float)):
                    tb.scalar(mk, mv, epoch + 1)
            tb.flush()
            wandb_w.log({"train_loss": meter.meters["loss"].global_avg,
                         **metrics}, step=epoch + 1)
            log.info(f"epoch {epoch}: loss {meter.meters['loss'].global_avg:.4f} "
                     f"{tput.rate:.1f} samples/s "
                     f"R@1 {metrics.get('image_to_enface_R@1', metrics.get('image_to_enface1_R@1', 0)):.3f}")
    wandb_w.finish()
    return state


if __name__ == "__main__":
    main()
