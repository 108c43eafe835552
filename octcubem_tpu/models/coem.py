"""retinal-COEM contrastive towers (OCT volume <-> en face IR/FAF).

Parity targets (retinal-COEM/src/open_clip/):
- OCT tower: ViT-ST with aggregate head projecting to the CLIP embed dim
  (models_vit_st_flash_attn_nodrop.py:40-262 — fc_aggregate_cls -> norm ->
  GELU -> head(out_dim)).
- Enface tower: 2D ViT trunk with a shared `head` projection + GELU +
  per-modality `mod_head_{i}` linears; forward(x, modality=i)
  (models_vit_flash_attn_2mod.py:160-185).
- CustomTextCLIP / CustomTextCLIP3Mod (model.py:635-720): 2-tower CLIP
  with logit_scale init ln(1/0.07); 3-mod adds logit_scale1/2.
- ClassificationHead + *Classification variants (model.py:723-810):
  concat tower features -> LayerNorm -> MLP; single-modality ablation
  zero-fills the missing towers.

Naming: the reference has a half-finished 'text' -> 'enface' rename
(SURVEY §2.7); this implementation standardizes on 'enface'.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..nn.layers import LN_EPS
from .vit_st import VisionTransformerST
from .vit2d import VisionTransformer2D

LOGIT_SCALE_INIT = float(np.log(1 / 0.07))
LOGIT_SCALE_MAX = float(np.log(100.0))  # clamp at ln100 (train_retclip.py:194)


class OCTTower(nn.Module):
    """ViT-ST trunk + aggregate projection head to `out_dim`."""

    out_dim: int = 512
    num_frames: int = 60
    t_patch_size: int = 3
    img_size: int = 256
    patch_size: int = 16
    in_chans: int = 1
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    drop_path_rate: float = 0.0
    global_pool: bool = True
    sep_pos_embed: bool = True
    cls_embed: bool = True
    parity: str = "flash"
    capture_cam: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    quant: bool = False  # int8 serving path (ops/quant.py)

    def setup(self):
        self.trunk = VisionTransformerST(
            num_frames=self.num_frames, t_patch_size=self.t_patch_size,
            img_size=self.img_size, patch_size=self.patch_size,
            in_chans=self.in_chans, num_classes=self.out_dim,
            embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads, drop_path_rate=self.drop_path_rate,
            global_pool=self.global_pool, sep_pos_embed=self.sep_pos_embed,
            cls_embed=self.cls_embed, head_type="aggregate",
            parity=self.parity, capture_cam=self.capture_cam,
            dtype=self.dtype, attn_impl=self.attn_impl, remat=self.remat,
            quant=self.quant)

    def __call__(self, x, deterministic: bool = True):
        return self.trunk(x, deterministic)

    def lock_groups(self):
        return [[f"trunk/{p}" for p in g] for g in
                VisionTransformerST.lock_groups(self.trunk)]


class EnfaceTower(nn.Module):
    """2D ViT trunk + shared projection + per-modality heads."""

    out_dim: int = 512
    num_mod_head: int = 2
    img_size: int = 384
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    drop_path_rate: float = 0.0
    global_pool: bool = True
    parity: str = "flash"
    capture_cam: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    quant: bool = False  # int8 serving path (ops/quant.py)

    def setup(self):
        self.trunk = VisionTransformer2D(
            img_size=self.img_size, patch_size=self.patch_size,
            in_chans=self.in_chans, num_classes=0, embed_dim=self.embed_dim,
            depth=self.depth, num_heads=self.num_heads,
            drop_path_rate=self.drop_path_rate, global_pool=self.global_pool,
            parity=self.parity, capture_cam=self.capture_cam,
            dtype=self.dtype, attn_impl=self.attn_impl, remat=self.remat,
            quant=self.quant)
        self.head = nn.Dense(self.out_dim, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.02))
        self.mod_heads = [
            nn.Dense(self.out_dim, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.02),
                     name=f"mod_head_{i}")
            for i in range(self.num_mod_head)
        ]

    def __call__(self, x, modality: int = 0, deterministic: bool = True):
        feat = self.trunk.forward_features(x, deterministic)
        feat = self.head(feat)
        feat = nn.gelu(feat, approximate=False)
        return self.mod_heads[modality](feat)


def _normalize(x):
    return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)


def _build_vision_tower(cfg, out_dim, dtype, attn_impl, remat, capture_cam,
                        quant=False):
    """Vision-tower dispatch mirroring _build_vision_tower
    (model.py:139-419): 'tower' names the branch ('vit2d' = ViT_2Dhead
    :353-409, 'vit_3dhead' = ViT_3Dhead :296-352); a list-valued 'layers'
    selects ModifiedResNet (the OpenCLIP convention, :410-418); 'hipt':
    true the HIPT region ViT (:150); default is the OCT ViT-ST tower
    (ViT_ST_nodrop, :243-295)."""
    cfg = dict(cfg or {})
    tower = cfg.pop("tower", None)
    if quant and tower not in (None, "vit2d"):
        raise ValueError(f"int8 quant is not wired for tower={tower!r} "
                         "(supported: the OCT ViT-ST and vit2d towers)")
    if quant and (isinstance(cfg.get("layers"), (list, tuple))
                  or cfg.get("hipt") or cfg.get("model_name")):
        raise ValueError("int8 quant is not wired for the aux towers")
    if tower == "vit2d":
        from .vit2d import VisionTransformer2D

        # the num_classes head doubles as the CLIP projection (model.py
        # ViT_2Dhead branch heads the 2D trunk to embed_dim)
        return VisionTransformer2D(num_classes=out_dim, dtype=dtype,
                                   attn_impl=attn_impl, remat=remat,
                                   quant=quant, **cfg)
    if tower == "vit_3dhead":
        from .vit_3dhead import VisionTransformer3DHead

        return VisionTransformer3DHead(num_classes=out_dim, dtype=dtype,
                                       attn_impl=attn_impl, remat=remat,
                                       **cfg)
    if isinstance(cfg.get("layers"), (list, tuple)):
        from .aux_towers import ModifiedResNet

        cfg["layers"] = tuple(cfg["layers"])
        return ModifiedResNet(output_dim=out_dim, dtype=dtype, **cfg)
    if cfg.pop("hipt", False):
        from .aux_towers import VisionTransformer4K

        # the cls head doubles as the CLIP projection
        return VisionTransformer4K(num_classes=out_dim, dtype=dtype, **cfg)
    if tower == "focalnet" or str(cfg.get("model_name", "")).startswith(
            "focalnet"):
        # timm adapter branch (model.py:139-148 + timm_model.py:30-125)
        from .aux_towers import FocalNetTower

        name = cfg.pop("model_name", "focalnet_tiny_srf")
        return FocalNetTower(out_dim=out_dim, model_name=name,
                             trunk_cfg=cfg, dtype=dtype)
    if tower == "perceiver" or "perceiver" in str(cfg.get("model_name", "")):
        # VisionPerceiver branch (model.py:185-190)
        from .aux_towers import PerceiverTower

        cfg.pop("model_name", None)
        return PerceiverTower(out_dim=out_dim, cfg=cfg, dtype=dtype)
    return OCTTower(out_dim=out_dim, dtype=dtype, attn_impl=attn_impl,
                    remat=remat, capture_cam=capture_cam, quant=quant, **cfg)



def _build_enface_tower(cfg, out_dim, dtype, attn_impl, remat, capture_cam,
                        quant=False):
    """Enface/'text' tower dispatch: the shipped configs feed IMAGES to a
    multi-head ViT trunk (EnfaceTower), but the reference also supports
    token-input text towers (model.py:440-477): 'hf_model_name' selects a
    HuggingFace encoder (hf_model.py:83-145) and 'text': true the native
    CLIP text transformer.  Both ignore the modality index (single
    projection)."""
    cfg = dict(cfg or {})
    if quant and (cfg.get("hf_model_name") or cfg.get("hf_config")
                  or cfg.get("text")):
        raise ValueError("int8 quant is not wired for text towers")
    if cfg.get("hf_model_name") or cfg.get("hf_config"):
        from .aux_towers import HFTextTower

        tower = HFTextTower(
            output_dim=out_dim,
            model_name_or_path=cfg.get("hf_model_name"),
            hf_config=cfg.get("hf_config"),
            pooler_type=cfg.get("pooler_type", "mean_pooler"),
            proj=cfg.get("proj", "linear"), dtype=dtype)
        return _TextTowerAdapter(tower=tower)
    if cfg.pop("text", False):
        from .aux_towers import TextTransformer

        return _TextTowerAdapter(tower=TextTransformer(
            output_dim=out_dim, dtype=dtype, **cfg))
    return EnfaceTower(out_dim=out_dim, dtype=dtype, attn_impl=attn_impl,
                       remat=remat, capture_cam=capture_cam, quant=quant,
                       **cfg)


class _TextTowerAdapter(nn.Module):
    """Adapts a (tokens -> feature) text tower to the enface call
    contract enface(x, modality, deterministic)."""

    tower: nn.Module

    def __call__(self, x, modality: int = 0, deterministic: bool = True):
        return self.tower(x, deterministic=deterministic)


class COEP2Tower(nn.Module):
    """2-tower contrastive model (OCTCube-IR).  forward -> (img_feat,
    enface_feat, logit_scale); features L2-normalized."""

    embed_dim: int = 512
    vision_cfg: dict = None
    enface_cfg: dict = None
    capture_cam: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    quant: bool = False  # int8 serving encoders (ops/quant.py)

    def setup(self):
        self.visual = _build_vision_tower(
            self.vision_cfg, self.embed_dim, self.dtype, self.attn_impl,
            self.remat, self.capture_cam, quant=self.quant)
        self.enface = _build_enface_tower(
            self.enface_cfg, self.embed_dim, self.dtype, self.attn_impl,
            self.remat, self.capture_cam, quant=self.quant)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(LOGIT_SCALE_INIT))

    def encode_image(self, image, normalize: bool = False,
                     deterministic: bool = True):
        f = self.visual(image, deterministic)
        return _normalize(f) if normalize else f

    def encode_enface(self, enface, normalize: bool = False, modality: int = 0,
                      deterministic: bool = True):
        f = self.enface(enface, modality, deterministic)
        return _normalize(f) if normalize else f

    def __call__(self, image, enface, single_modality: Optional[str] = None,
                 deterministic: bool = True):
        scale = jnp.exp(jnp.clip(self.logit_scale, None, LOGIT_SCALE_MAX))
        if single_modality == "image":
            return self.encode_image(image, True, deterministic), None, scale
        if single_modality == "enface":
            return None, self.encode_enface(enface, True, 0, deterministic), scale
        return (self.encode_image(image, True, deterministic),
                self.encode_enface(enface, True, 0, deterministic), scale)


class COEP3Tower(nn.Module):
    """3-modality model (OCT + IR + FAF via the 2-head enface trunk).
    forward -> (img, enf1, enf2, scale, scale1, scale2)."""

    embed_dim: int = 512
    vision_cfg: dict = None
    enface_cfg: dict = None
    capture_cam: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    quant: bool = False  # int8 serving encoders (ops/quant.py)

    def setup(self):
        self.visual = _build_vision_tower(
            self.vision_cfg, self.embed_dim, self.dtype, self.attn_impl,
            self.remat, self.capture_cam, quant=self.quant)
        cfg = dict(self.enface_cfg or {})
        cfg.setdefault("num_mod_head", 2)
        self.enface = _build_enface_tower(
            cfg, self.embed_dim, self.dtype, self.attn_impl,
            self.remat, self.capture_cam, quant=self.quant)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(LOGIT_SCALE_INIT))
        self.logit_scale1 = self.param(
            "logit_scale1", lambda k: jnp.asarray(LOGIT_SCALE_INIT))
        self.logit_scale2 = self.param(
            "logit_scale2", lambda k: jnp.asarray(LOGIT_SCALE_INIT))

    def __call__(self, image, enface1, enface2,
                 single_modality: Optional[str] = None,
                 deterministic: bool = True):
        scales = tuple(
            jnp.exp(jnp.clip(s, None, LOGIT_SCALE_MAX))
            for s in (self.logit_scale, self.logit_scale1, self.logit_scale2))
        img = enf1 = enf2 = None
        if single_modality in (None, "image"):
            img = _normalize(self.visual(image, deterministic))
        if single_modality in (None, "enface1"):
            enf1 = _normalize(self.enface(enface1, 0, deterministic))
        if single_modality in (None, "enface2"):
            enf2 = _normalize(self.enface(enface2, 1, deterministic))
        return (img, enf1, enf2) + scales


class ClassificationHead(nn.Module):
    """LayerNorm -> fc1 -> GELU -> fc2 (model.py:723-739)."""

    hidden_dim: int
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32,
                         name="input_norm")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.02), name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


class COEP2TowerClassification(nn.Module):
    """Concat 2-tower features -> classification head (model.py:741-770)."""

    embed_dim: int = 512
    num_classes: int = 2
    vision_cfg: dict = None
    enface_cfg: dict = None
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    def setup(self):
        self.clip = COEP2Tower(
            embed_dim=self.embed_dim, vision_cfg=self.vision_cfg,
            enface_cfg=self.enface_cfg, dtype=self.dtype,
            attn_impl=self.attn_impl, remat=self.remat)
        self.classification_head = ClassificationHead(
            self.embed_dim, self.num_classes, self.dtype)

    def __call__(self, image, enface, single_modality: Optional[str] = None,
                 deterministic: bool = True):
        img, enf, scale = self.clip(image, enface, single_modality,
                                    deterministic)
        if single_modality == "image":
            feats = jnp.concatenate([img, jnp.zeros_like(img)], axis=-1)
        elif single_modality == "enface":
            feats = jnp.concatenate([jnp.zeros_like(enf), enf], axis=-1)
        else:
            feats = jnp.concatenate([img, enf], axis=-1)
        return self.classification_head(feats), scale


class COEP3TowerClassification(nn.Module):
    """Concat 3-tower features -> classification head (model.py:772-810)."""

    embed_dim: int = 512
    num_classes: int = 2
    vision_cfg: dict = None
    enface_cfg: dict = None
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    def setup(self):
        self.clip = COEP3Tower(
            embed_dim=self.embed_dim, vision_cfg=self.vision_cfg,
            enface_cfg=self.enface_cfg, dtype=self.dtype,
            attn_impl=self.attn_impl, remat=self.remat)
        self.classification_head = ClassificationHead(
            self.embed_dim, self.num_classes, self.dtype)

    def __call__(self, image, enface1, enface2,
                 single_modality: Optional[str] = None,
                 deterministic: bool = True):
        img, e1, e2, s0, s1, s2 = self.clip(image, enface1, enface2,
                                            single_modality, deterministic)
        z = next(f for f in (img, e1, e2) if f is not None)
        zero = jnp.zeros_like(z)
        feats = jnp.concatenate(
            [img if img is not None else zero,
             e1 if e1 is not None else zero,
             e2 if e2 is not None else zero], axis=-1)
        return self.classification_head(feats), s0, s1, s2
