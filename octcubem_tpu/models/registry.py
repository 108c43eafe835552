"""Model name registry — the reference's ``models_*.__dict__[name]``
constructor pattern (main_pretrain…py:414, main_finetune…singlefold.py:
456-536) plus the COEM JSON-config factory (open_clip/factory.py:41-61,
232-352).

Model families map to the reference modules:
  vit_st            -> models_vit_st_flash_attn_nodrop (aggregate head)
  vit_st_dropout    -> models_vit_st_flash_attn (dropout head)
  vit2d             -> models_vit / models_vit_flash_attn
  vit_3dhead        -> models_vit_3dhead_flash_attn
  mae3d             -> models_mae_joint_res_flash_attn
  slivit            -> model_slivit_baseline / models_vit_st_flash_attn_slivit
  coem2 / coem3     -> open_clip CustomTextCLIP(3Mod)
"""

from __future__ import annotations

import json
import os
from . import mae3d, vit_st, vit2d, vit_3dhead, coem, slivit

_FAMILIES = {
    "vit_st": vit_st,
    "vit_st_dropout": vit_st,
    "vit2d": vit2d,
    "vit_3dhead": vit_3dhead,
    "mae3d": mae3d,
    "slivit": slivit,
}


def create_model(family: str, name: str, **kwargs):
    """create_model('vit_st', 'flash_attn_vit_large_patch16', ...)"""
    mod = _FAMILIES[family]
    if family == "vit_st_dropout":
        kwargs.setdefault("head_type", "dropout")
    ctor = getattr(mod, name, None)
    if ctor is None:
        raise KeyError(
            f"unknown model {name!r} in family {family!r}; available: "
            f"{[n for n in dir(mod) if n.startswith(('vit', 'mae', 'flash'))]}")
    return ctor(**kwargs)


CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def list_coem_configs() -> list[str]:
    if not os.path.isdir(CONFIG_DIR):
        return []
    return sorted(f[:-5] for f in os.listdir(CONFIG_DIR) if f.endswith(".json"))


def create_coem_model(name_or_path: str, num_classes: int | None = None,
                      **kwargs):
    """Build a COEM model from a JSON config (reference model_configs/
    pattern).  Config schema: {embed_dim, three_mod, vision_cfg,
    enface_cfg}."""
    path = (name_or_path if os.path.isfile(name_or_path)
            else os.path.join(CONFIG_DIR, name_or_path + ".json"))
    with open(path) as f:
        cfg = json.load(f)
    three_mod = cfg.pop("three_mod", False)
    cfg.update(kwargs)
    if num_classes is not None:
        cls = (coem.COEP3TowerClassification if three_mod
               else coem.COEP2TowerClassification)
        return cls(num_classes=num_classes, **cfg)
    return (coem.COEP3Tower if three_mod else coem.COEP2Tower)(**cfg)
