"""Checkpoint save/resume (orbax) + latest-checkpoint discovery.

Parity targets (SURVEY §5.4):
- reference saves {'model','optimizer','epoch','scaler','args'} per epoch
  (OCTCube/util/misc.py:306-324); here the TrainState pytree + metadata go
  through orbax (no scaler — bf16 needs none).
- `--resume latest` picks the highest-numbered checkpoint
  (misc.py:327-342) -> latest_checkpoint().
- COEM-style save_frequency / most-recent / keep-last-N options.
- SPL dict pickling is handled by data/spl.py.
"""

from __future__ import annotations

import os
import re
from typing import Any

import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, keep_last: int | None = None) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep_last, create=True, enable_async_checkpointing=False)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    extra: dict | None = None,
                    keep_last: int | None = None) -> None:
    """Save a TrainState (or any pytree) + JSON-able metadata at `step`."""
    mgr = _manager(ckpt_dir, keep_last)
    args = ocp.args.Composite(
        state=ocp.args.StandardSave(state),
        **({"extra": ocp.args.JsonSave(extra)} if extra else {}),
    )
    mgr.save(step, args=args)
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if re.fullmatch(r"\d+", name):
            steps.append(int(name))
    return max(steps) if steps else None


def delete_recent_checkpoints(ckpt_dir: str, n: int) -> list[int]:
    """Delete the n most recent checkpoints — the reference's NaN-loss
    cleanup (engine_pretrain.py:153-161 deletes num_checkpoint_del most
    recent checkpoints before raising, so a resume restarts from a
    pre-divergence state)."""
    import shutil

    deleted = []
    for _ in range(n):
        step = latest_step(ckpt_dir)
        if step is None:
            break
        shutil.rmtree(os.path.join(ckpt_dir, str(step)), ignore_errors=True)
        deleted.append(step)
    return deleted


def restore_raw(ckpt_dir: str, step: int | None = None) -> tuple[Any, int]:
    """Restore the raw checkpoint pytree (nested dicts of arrays) WITHOUT
    a template — for partial / cross-model loads, e.g. initializing the
    COEM classification towers from a trained retclip run's TrainState
    (the reference loads the contrastive state_dict into the
    Classification model strict=False,
    main_retclip_finetune_more_cls_3mod.py:452-470)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    mgr = _manager(ckpt_dir)
    out = mgr.restore(step, args=ocp.args.Composite(
        state=ocp.args.StandardRestore()))
    mgr.close()
    return out["state"], step


def restore_checkpoint(ckpt_dir: str, state_template: Any,
                       step: int | None = None) -> tuple[Any, dict | None, int]:
    """Restore (state, extra, step). step=None -> latest."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    mgr = _manager(ckpt_dir)
    has_extra = os.path.isdir(os.path.join(ckpt_dir, str(step), "extra"))
    args = {"state": ocp.args.StandardRestore(state_template)}
    if has_extra:
        args["extra"] = ocp.args.JsonRestore()
    out = mgr.restore(step, args=ocp.args.Composite(**args))
    mgr.close()
    return out["state"], (out.get("extra") if has_extra else None), step
