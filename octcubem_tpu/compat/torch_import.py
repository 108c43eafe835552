"""PyTorch checkpoint importer: reference OCTCube state dicts -> flax params.

Reproduces the reference's conversion-on-load ecosystem (SURVEY.md §5.4):
- flash-attn-style checkpoints (blocks.i.mixer.Wqkv / mixer.out_proj) map
  directly onto our block param names.
- non-flash checkpoints (blocks.i.attn.{q,k,v}, attn.proj) are fused into
  Wqkv, mirroring load_state_dict_to_backbone
  (OCTCube/models_vit_st_flash_attn_nodrop.py:270-302).
- RETFound-style fused qkv (blocks.i.attn.qkv) maps to Wqkv, mirroring
  load_state_dict_to_backbone_retfound
  (Pre-training/models_mae_joint_res_flash_attn.py:728-775).
- Conv3d/Conv2d patch-embed weights are permuted to the einsum layout.
- pos embeds are interpolated on load when the grid / frame count differs
  (OCTCube/util/pos_embed.py:71-140): spatial bicubic, temporal linear or
  middle-crop.

All transforms are pure numpy; no torch import needed unless reading a
.pth file.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp

from ..ops.resize import _interp_matrix_1d


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Read a reference .pth checkpoint into {key: np.ndarray}.

    Handles the 'model' / 'state_dict' wrapping and 'module.' prefixes used
    by the reference save paths (OCTCube/util/misc.py:306-324,
    retinal-COEM main_retclip.py:242-263).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "model_state", "teacher"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
            break
    out = {}
    for k, v in ckpt.items():
        if not hasattr(v, "numpy"):
            continue
        k = k.removeprefix("module.")
        out[k] = v.float().numpy()
    return out


def check_geometry_stamp(path: str, num_heads: int,
                         decoder_num_heads: int | None = None) -> None:
    """Validate a consumer's head count against the geometry stamp the
    export CLI writes into .pth files ('octcubem_tpu_geometry').  The
    attention tensors are shape-identical across head partitionings, so
    loading an enc8-pretrained encoder into a 16-head model succeeds and
    silently computes the wrong function — fail loudly instead.
    `decoder_num_heads` extends the same check to MAE checkpoints whose
    decoder is about to keep training (cli.pretrain --init_ckpt).
    Reference checkpoints carry no stamp: skip silently."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False,
                          mmap=True)
    except Exception:
        try:  # pre-zipfile .pth (mmap unsupported): plain load
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
        except Exception:
            return  # stamp checking must never block a legitimate load
    geom = ckpt.get("octcubem_tpu_geometry") if isinstance(ckpt, dict) \
        else None
    checks = [("num_heads", num_heads, "--num_heads")]
    if decoder_num_heads is not None:
        checks.append(("decoder_num_heads", decoder_num_heads,
                       "--decoder_num_heads"))
    for field, built, flag in checks:
        stamped = (geom or {}).get(field)
        if stamped is not None and stamped != built:
            raise SystemExit(
                f"{path} was pretrained with {field}={stamped} (geometry "
                f"stamp), but this run builds the model with {field}="
                f"{built}.  The tensors load cleanly either way and the "
                "model would silently compute the WRONG function — pass "
                f"{flag} {stamped} (or the matching config).")


# ------------------------------------------------------------------ rules

def _fuse_qkv(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """attn.{q,k,v} -> mixer.Wqkv, attn.qkv -> mixer.Wqkv,
    attn.proj -> mixer.out_proj (prefix-preserving, any block depth)."""
    out = dict(sd)
    # separate q/k/v linears
    qs = [k for k in sd if re.search(r"\.attn\.q\.weight$", k)]
    for qk in qs:
        prefix = qk[: -len("q.weight")]
        ws = [out.pop(prefix + f"{n}.weight") for n in "qkv"]
        out[prefix.replace(".attn.", ".mixer.")[:-1] + ".Wqkv.weight"] = (
            np.concatenate(ws, axis=0))
        if prefix + "q.bias" in out:
            bs = [out.pop(prefix + f"{n}.bias") for n in "qkv"]
            out[prefix.replace(".attn.", ".mixer.")[:-1] + ".Wqkv.bias"] = (
                np.concatenate(bs, axis=0))
    renames = {}
    for k in out:
        if ".attn.qkv." in k:
            renames[k] = k.replace(".attn.qkv.", ".mixer.Wqkv.")
        elif ".attn.proj." in k:
            renames[k] = k.replace(".attn.proj.", ".mixer.out_proj.")
    for old, new in renames.items():
        out[new] = out.pop(old)
    return out


def _to_flax_path(key: str) -> tuple[list[str], str]:
    """Translate a reference state-dict key into (flax path, kind).

    kind: 'linear_w' | 'conv_patch' | 'norm_w' | 'direct'
    """
    parts = key.split(".")
    path: list[str] = []
    kind = "direct"
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("blocks", "decoder_blocks") and i + 1 < len(parts) and parts[i + 1].isdigit():
            path.append(p)
            path.append(f"blocks_{parts[i + 1]}")
            i += 2
            continue
        if p == "proj" and path and path[-1].endswith("patch_embed"):
            # patch_embed.proj.{weight,bias} -> patch_embed/{kernel,bias}
            nxt = parts[i + 1]
            path.append("kernel" if nxt == "weight" else "bias")
            kind = "conv_patch" if nxt == "weight" else "direct"
            return path, kind
        if p == "weight":
            # norm layers keep 'scale'; linears use 'kernel'
            parent = path[-1] if path else ""
            if parent.startswith("norm") or parent.endswith("norm") or parent == "ln":
                path.append("scale")
                kind = "norm_w"
            else:
                path.append("kernel")
                kind = "linear_w"
            return path, kind
        if p == "bias":
            path.append("bias")
            return path, "direct"
        path.append(p)
        i += 1
    return path, kind


def translate_state_dict(sd: Mapping[str, np.ndarray]) -> dict[tuple, np.ndarray]:
    """Reference state dict -> {flax param path tuple: np.ndarray}."""
    sd = _fuse_qkv(dict(sd))
    out: dict[tuple, np.ndarray] = {}
    for key, val in sd.items():
        path, kind = _to_flax_path(key)
        arr = np.asarray(val)
        if kind == "linear_w":
            arr = arr.T  # torch [out, in] -> flax [in, out]
        elif kind == "conv_patch":
            if arr.ndim == 5:   # Conv3d [D, C, t, p, p] -> [t, p, p, C, D]
                arr = arr.transpose(2, 3, 4, 1, 0)
            elif arr.ndim == 4:  # Conv2d [D, C, p, p] -> [p, p, C, D]
                arr = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:
                # already flattened to Linear [D, t*p*p*C] by an upstream
                # converter; restore einsum layout is impossible without
                # shape info — leave for the caller (rare path)
                arr = arr.T
        out[tuple(path)] = arr
    return out


# ------------------------------------------------- pos-embed interpolation

def _interp_spatial(arr: np.ndarray, new_l: int, n_extra: int) -> np.ndarray:
    """[1, extra+H*W, D] -> [1, extra+H'*W', D] torch-bicubic."""
    d = arr.shape[-1]
    old_l = arr.shape[1] - n_extra
    old_g = int(round(old_l ** 0.5))
    new_g = int(round(new_l ** 0.5))
    if old_g == new_g:
        return arr
    extra = arr[:, :n_extra]
    grid = arr[:, n_extra:].reshape(1, old_g, old_g, d)
    m = _interp_matrix_1d(old_g, new_g, "cubic").astype(arr.dtype)
    grid = np.einsum("Hh,bhwd->bHwd", m, grid)
    grid = np.einsum("Ww,bhwd->bhWd", m, grid)
    return np.concatenate([extra, grid.reshape(1, new_g * new_g, d)], axis=1)


def _interp_temporal(arr: np.ndarray, new_t: int, mode: str) -> np.ndarray:
    """[1, T, D] -> [1, T', D] linear or middle-crop."""
    old_t = arr.shape[1]
    if old_t == new_t:
        return arr
    if old_t > new_t and mode == "crop":
        start = (old_t - new_t) // 2
        return arr[:, start : start + new_t]
    m = _interp_matrix_1d(old_t, new_t, "linear").astype(arr.dtype)
    return np.einsum("Tt,btd->bTd", m, arr)


# ------------------------------------------------------------------ merge

def _flatten(tree: Any, prefix=()) -> dict[tuple, Any]:
    if isinstance(tree, Mapping):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
        return out
    return {prefix: tree}


def _unflatten(flat: dict[tuple, Any]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def convert_retfound_2d_state_dict(
    sd: Mapping[str, np.ndarray], t_patch_size: int, target_grid: int,
    duplicate_high_res: bool = True,
) -> dict[str, np.ndarray]:
    """RETFound / ImageNet-MAE 2D checkpoint -> joint-res 3D MAE layout.

    Reproduces the reference resume_type='retfound_2_flash_attn' chain
    (Pre-training/custom_util/misc.py:509-621, 699-726 +
    convert_patchembed_2Dto3D):
    - pos_embed [1, 1+196, D] -> pos_embed_class + pos_embed_spatial
      (bicubic 14x14 -> target grid);
    - Conv2d patch embed [D, C, p, p] -> Conv3d [D, C, t, p, p] inflated by
      repeating over t and dividing by t;
    - optional duplication into high_res_patch_embed.
    pos_embed_temporal / decoder params absent from 2D checkpoints stay at
    init (reported as 'missing' by import_state_dict).
    """
    out = dict(sd)
    for prefix in ("", "decoder_"):
        key = f"{prefix}pos_embed"
        if key in out:
            pe = np.asarray(out.pop(key))
            cls, spatial = pe[:, :1], pe[:, 1:]
            grid0 = int(round(spatial.shape[1] ** 0.5))
            spatial = _interp_spatial(spatial, target_grid ** 2, 0)
            out[f"{prefix}pos_embed_class"] = cls
            out[f"{prefix}pos_embed_spatial"] = spatial
    if "patch_embed.proj.weight" in out:
        w2d = np.asarray(out["patch_embed.proj.weight"])
        if w2d.ndim == 4:
            w3d = np.repeat(w2d[:, :, None], t_patch_size, axis=2) / t_patch_size
            out["patch_embed.proj.weight"] = w3d
            if duplicate_high_res:
                out["high_res_patch_embed.proj.weight"] = w3d
                if "patch_embed.proj.bias" in out:
                    out["high_res_patch_embed.proj.bias"] = out[
                        "patch_embed.proj.bias"]
    return out


def import_state_dict(
    params: Mapping,
    state_dict: Mapping[str, np.ndarray],
    *,
    strict: bool = True,
    drop_keys: tuple[str, ...] = (),
    smaller_interpolate_type: str = "interp",
    dtype=jnp.float32,
) -> tuple[dict, dict]:
    """Merge a reference state dict into a flax params template.

    - drop_keys: substrings of reference keys to skip (the reference's
      filter_keys, e.g. ('head',) when fine-tuning a new task).
    - pos embeds whose shape mismatches are interpolated (spatial bicubic,
      temporal linear/crop) exactly like the reference load path.

    Returns (new_params, report) where report lists 'missing' (template
    entries not in the checkpoint) and 'unexpected' (checkpoint keys with
    no template slot).
    """
    template = _flatten(dict(params["params"] if "params" in params else params))
    sd = {k: v for k, v in state_dict.items()
          if not any(s in k for s in drop_keys)}
    translated = translate_state_dict(sd)

    merged: dict[tuple, Any] = {}
    unexpected = []
    for path, arr in translated.items():
        if path not in template:
            unexpected.append(".".join(path))
            continue
        tgt = template[path]
        if arr.shape != tgt.shape:
            name = path[-2] if len(path) > 1 else path[-1]
            joined = "/".join(path)
            if "pos_embed_temporal" in joined:
                arr = _interp_temporal(arr, tgt.shape[1], smaller_interpolate_type)
            elif "pos_embed" in joined:
                n_extra = arr.shape[1] - int(round((arr.shape[1]) ** 0.5)) ** 2
                # flat pos_embed with cls token: extra = total - square part
                if "pos_embed_spatial" in joined:
                    n_extra = 0
                arr = _interp_spatial(arr, tgt.shape[1] - n_extra, n_extra)
            if arr.shape != tgt.shape:
                raise ValueError(
                    f"shape mismatch for {joined}: ckpt {arr.shape} vs "
                    f"model {tgt.shape}")
        merged[path] = jnp.asarray(arr, dtype)
    missing = [".".join(p) for p in template if p not in merged]
    for p in template:
        if p not in merged:
            merged[p] = template[p]
    if strict and unexpected:
        raise ValueError(f"unexpected checkpoint keys: {unexpected}")
    new_params = _unflatten(merged)
    if "params" in params:
        new_params = {**dict(params), "params": new_params}
    return new_params, {"missing": missing, "unexpected": unexpected}
