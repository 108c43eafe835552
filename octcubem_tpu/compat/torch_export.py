"""PyTorch checkpoint exporter: flax params -> reference OCTCube state dicts.

The exact inverse of compat/torch_import.py: users who train in this
framework can hand their checkpoints back to the reference ecosystem
(OCTCube/models_vit_st_flash_attn_nodrop.py, the inference notebook,
retinal-COEM tower loaders) without a conversion script on the torch
side.  Two layouts:

- 'flash' (default): blocks.i.mixer.Wqkv / mixer.out_proj — the layout
  the reference's flash-attn models save and load directly
  (OCTCube/models_mae_flash_attn.py:361-405 maps OTHER layouts INTO this
  one, so it is the canonical on-disk form of released checkpoints).
- 'retfound': blocks.i.attn.qkv / attn.proj — the timm/RETFound fused
  layout consumed by the reference's non-flash models and by
  load_state_dict_to_backbone_retfound
  (Pre-training/models_mae_joint_res_flash_attn.py:728-775).

All transforms are pure numpy; torch is only needed by
save_torch_checkpoint (reading it back with torch.load).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _flatten(tree: Any, prefix=()) -> dict[tuple, Any]:
    if isinstance(tree, Mapping):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
        return out
    return {prefix: tree}


def _to_torch_key(path: tuple[str, ...]) -> tuple[str, str]:
    """Flax param path tuple -> (reference state-dict key, kind).

    kind: 'linear_w' | 'conv_patch' | 'direct' — what layout transform
    the VALUE needs (inverse of torch_import._to_flax_path).
    """
    parts: list[str] = []
    kind = "direct"
    for i, p in enumerate(path):
        if p.startswith("blocks_") and p[len("blocks_"):].isdigit() and \
                parts and parts[-1] in ("blocks", "decoder_blocks"):
            parts.append(p[len("blocks_"):])
            continue
        if p == "kernel":
            if len(path) >= 2 and path[-2].endswith("patch_embed"):
                parts.extend(("proj", "weight"))
                kind = "conv_patch"
            else:
                parts.append("weight")
                kind = "linear_w"
            continue
        if p == "scale":
            parts.append("weight")
            continue
        if p == "bias" and len(path) >= 2 and path[-2].endswith("patch_embed"):
            parts.extend(("proj", "bias"))
            continue
        parts.append(p)
    return ".".join(parts), kind


def export_state_dict(params: Mapping, *, style: str = "flash",
                      dtype=np.float32) -> dict[str, np.ndarray]:
    """Flax params (with or without the 'params' root) -> reference-style
    torch state dict {key: np.ndarray}.

    Roundtrip-exact with torch_import.import_state_dict:
    import(export(p)) == p (tests/test_torch_export.py).
    """
    tree = params["params"] if "params" in params else params
    out: dict[str, np.ndarray] = {}
    for path, leaf in _flatten(dict(tree)).items():
        key, kind = _to_torch_key(path)
        arr = np.asarray(leaf, dtype)
        if kind == "linear_w":
            arr = arr.T                         # flax [in,out] -> torch [out,in]
        elif kind == "conv_patch":
            if arr.ndim == 5:                   # [t,p,p,C,D] -> [D,C,t,p,p]
                arr = arr.transpose(4, 3, 0, 1, 2)
            elif arr.ndim == 4:                 # [p,p,C,D] -> [D,C,p,p]
                arr = arr.transpose(3, 2, 0, 1)
            else:
                arr = arr.T
        out[key] = np.ascontiguousarray(arr)
    if style == "retfound":
        out = to_retfound_layout(out)
    elif style != "flash":
        raise ValueError(f"unknown export style {style!r}")
    return out


def to_retfound_layout(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """flash layout -> timm/RETFound fused-qkv layout
    (mixer.Wqkv -> attn.qkv, mixer.out_proj -> attn.proj)."""
    out = {}
    for k, v in sd.items():
        if ".mixer.Wqkv." in k:
            k = k.replace(".mixer.Wqkv.", ".attn.qkv.")
        elif ".mixer.out_proj." in k:
            k = k.replace(".mixer.out_proj.", ".attn.proj.")
        out[k] = v
    return out


def save_torch_checkpoint(path: str, state_dict: Mapping[str, np.ndarray],
                          extra: Mapping[str, Any] | None = None) -> None:
    """Write a reference-loadable .pth: {'model': state_dict, **extra}
    (the wrapping misc.save_model uses, OCTCube/util/misc.py:306-324)."""
    import torch

    # copy: jax/np views can be non-writable, which torch warns about
    payload = {"model": {k: torch.from_numpy(np.array(v))
                         for k, v in state_dict.items()}}
    if extra:
        payload.update(extra)
    torch.save(payload, path)
