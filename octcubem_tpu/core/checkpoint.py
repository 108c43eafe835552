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

import atexit
import os
import re
from typing import Any

import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, keep_last: int | None = None,
             async_save: bool = False) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep_last, create=True,
        enable_async_checkpointing=async_save)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


# Long-lived managers for async saves, keyed by abs dir.  Async managers
# must stay open while the background write runs; wait_for_saves() (or any
# read/delete helper below, which call it) is the commit barrier.
_ASYNC_MANAGERS: dict[str, ocp.CheckpointManager] = {}


def wait_for_saves(ckpt_dir: str | None = None) -> None:
    """Block until pending async saves (for `ckpt_dir`, or all) commit."""
    if ckpt_dir is not None:
        mgr = _ASYNC_MANAGERS.get(os.path.abspath(ckpt_dir))
        if mgr is not None:
            mgr.wait_until_finished()
        return
    for mgr in _ASYNC_MANAGERS.values():
        mgr.wait_until_finished()


def _close_async_managers() -> None:
    for key in list(_ASYNC_MANAGERS):
        mgr = _ASYNC_MANAGERS.pop(key)
        mgr.wait_until_finished()
        mgr.close()


atexit.register(_close_async_managers)


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    extra: dict | None = None,
                    keep_last: int | None = None,
                    async_save: bool = False) -> None:
    """Save a TrainState (or any pytree) + JSON-able metadata at `step`.

    async_save=True returns as soon as the device->host copy is staged and
    writes to disk in the background (the training CLIs use this so the
    multi-GB ViT-L state write overlaps the next epoch's compute — the
    reference's rank-0 torch.save blocks the step loop,
    custom_util/misc.py:376-387).  The restore/delete/latest helpers below
    act as commit barriers, so readers never observe a half-written step.
    """
    args = ocp.args.Composite(
        state=ocp.args.StandardSave(state),
        **({"extra": ocp.args.JsonSave(extra)} if extra else {}),
    )
    if async_save:
        key = os.path.abspath(ckpt_dir)
        mgr = _ASYNC_MANAGERS.get(key)
        if mgr is None:
            mgr = _manager(ckpt_dir, keep_last, async_save=True)
            _ASYNC_MANAGERS[key] = mgr
        mgr.save(step, args=args)  # waits for the PREVIOUS save internally
        return
    mgr = _manager(ckpt_dir, keep_last)
    mgr.save(step, args=args)
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> int | None:
    wait_for_saves(ckpt_dir)
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

    wait_for_saves(ckpt_dir)
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
    wait_for_saves(ckpt_dir)
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
    wait_for_saves(ckpt_dir)
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
