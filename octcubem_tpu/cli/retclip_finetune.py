"""CLIP-classification fine-tune: COEM towers + classification head.

Parity target: retinal-COEM/src/training/main_retclip_finetune_more_cls.py
and ..._3mod.py (SURVEY §2.8): k-fold CV over GA-growth / disease labels
using CustomTextCLIP(3Mod)Classification, best-val/best-test tracking,
single-modality ablation via --single_modality.
"""

from __future__ import annotations

import argparse
import functools
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser("OCTCube-TPU retclip classification")
    parser.add_argument("--three_mod", action="store_true")
    parser.add_argument("--single_modality", default=None,
                        choices=[None, "image", "enface", "enface1", "enface2"])
    parser.add_argument("--num_classes", type=int, default=2)
    parser.add_argument("--k_folds", type=int, default=2)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--synthetic_n", type=int, default=32)
    parser.add_argument("--output_dir", default="./output_retclip_cls")
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..core import mesh as meshlib, ckpt_registry, checkpoint as ckpt_lib
    from ..models import coem
    from ..train import optim, losses
    from ..train.train_state import TrainState
    from ..train.mae_engine import shard_batch
    from ..train import metrics as metrics_lib
    from ..utils.logging import get_logger, JsonlLogger

    os.makedirs(args.output_dir, exist_ok=True)
    log = get_logger("retclip_cls", os.path.join(args.output_dir, "out.log"))

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
    if args.three_mod:
        ecfg["num_mod_head"] = 2
        model = coem.COEP3TowerClassification(
            embed_dim=edim, num_classes=args.num_classes,
            vision_cfg=vcfg, enface_cfg=ecfg)
    else:
        model = coem.COEP2TowerClassification(
            embed_dim=edim, num_classes=args.num_classes,
            vision_cfg=vcfg, enface_cfg=ecfg)

    frames, osz, esz = vcfg["num_frames"], vcfg["img_size"], ecfg["img_size"]
    rng0 = np.random.default_rng(0)

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

    def batches(idx, shuffle_seed=None):
        idx = list(idx)
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(idx)
        for s in range(0, len(idx) - batch + 1, batch):
            sel = [items[i] for i in idx[s:s + batch]]
            yield (jnp.asarray(np.stack([x[0] for x in sel])),
                   jnp.asarray(np.stack([x[1] for x in sel])),
                   jnp.asarray(np.stack([x[2] for x in sel])))

    sm = args.single_modality
    if args.three_mod and sm == "enface":
        sm = "enface1"

    def fwd(params, vol, enf, deterministic=True, rng=None):
        rngs = {"dropout": rng} if rng is not None else {}
        if args.three_mod:
            out = model.apply(params, vol, enf, enf[:, ::-1],
                              single_modality=sm,
                              deterministic=deterministic, rngs=rngs)
        else:
            out = model.apply(params, vol, enf, single_modality=sm,
                              deterministic=deterministic, rngs=rngs)
        return out[0]

    registry_entries = {}
    jsonl = JsonlLogger(args.output_dir, "results.jsonl")
    fold_splits = np.array_split(np.arange(len(items)), args.k_folds)

    for fold in range(args.k_folds):
        val_idx = fold_splits[fold]
        train_idx = np.concatenate(
            [fold_splits[j] for j in range(args.k_folds) if j != fold])
        vol0, enf0, _ = next(batches(train_idx))
        if args.three_mod:
            params = model.init(jax.random.key(fold), vol0, enf0,
                                enf0[:, ::-1], single_modality=sm)
        else:
            params = model.init(jax.random.key(fold), vol0, enf0,
                                single_modality=sm)
        tx = optim.build_adamw(params, args.lr, weight_decay=0.1)
        state = TrainState.create(params, tx, jax.random.key(fold + 100))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, vol, enf, y):
            rng, new_rng = jax.random.split(state.rng)

            def loss_fn(p):
                logits = fwd(p, vol, enf, deterministic=False, rng=rng)
                return losses.softmax_ce(logits, y)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return (state.apply_gradients(tx, grads).replace(rng=new_rng),
                    loss)

        predict = jax.jit(lambda p, v, e: fwd(p, v, e))
        best_auc, best_epoch = -1.0, -1
        with mesh:
            for epoch in range(args.epochs):
                train_losses = []
                for vol, enf, y in batches(train_idx, shuffle_seed=(fold, epoch)):
                    state, loss = step(state, shard_batch(vol, mesh),
                                       shard_batch(enf, mesh), y)
                    train_losses.append(float(loss))
                preds, trues = [], []
                for vol, enf, y in batches(val_idx):
                    preds.append(np.asarray(predict(state.params, vol, enf)))
                    trues.append(np.asarray(y))
                m = metrics_lib.compute_metrics(
                    "multi_cls", np.concatenate(trues), np.concatenate(preds))
                auc = m["macro_roc_ovr"]
                if auc > best_auc:
                    best_auc, best_epoch = auc, epoch
                    cdir = os.path.join(args.output_dir, f"ckpt_fold{fold}")
                    ckpt_lib.save_checkpoint(cdir, epoch, state,
                                             {"epoch": epoch}, keep_last=1)
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


if __name__ == "__main__":
    main()
