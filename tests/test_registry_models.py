"""Registry-wide constructor + forward smoke over every model name —
guards against name/arch mismatches like vit_huge_patch14 constructing
patch 16 (reference archs: models_vit_st_flash_attn_nodrop.py:353-404,
models_mae_joint_res_flash_attn.py:792-843)."""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octcubem_tpu.models import registry


def _names(mod):
    return sorted(
        n for n in dir(mod)
        if n.startswith(("vit_", "mae_", "flash_attn_"))
        and callable(getattr(mod, n)))


CASES = [(fam, name) for fam, mod in registry._FAMILIES.items()
         for name in _names(mod)]


@pytest.mark.parametrize("family,name", CASES,
                         ids=[f"{f}:{n}" for f, n in CASES])
@pytest.mark.slow
def test_registry_name_constructs_and_forwards(family, name):
    patch = int(re.search(r"patch(\d+)", name).group(1))
    img = patch * 2
    kw = dict(attn_impl="naive")
    if family == "mae3d":
        kw.update(input_size=img, high_res_input_size=img * 2, in_chans=1,
                  num_frames=6, t_patch_size=3, pred_t_dim=6,
                  decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2)
    elif family in ("vit_st", "vit_st_dropout"):
        kw.update(img_size=img, in_chans=1, num_frames=6, t_patch_size=3,
                  num_classes=4)
    elif family == "vit_3dhead":
        kw.update(img_size=img, in_chans=1, num_classes=4)
    elif family == "slivit":  # ViT-ST trunk + SLIViT head
        kw.update(img_size=img, in_chans=1, num_frames=6, t_patch_size=3,
                  num_classes=4, embed_dim=32, depth=2, num_heads=2,
                  slivit_depth=1)
    else:  # vit2d
        kw.update(img_size=img, in_chans=1, num_classes=4)

    m = registry.create_model(family, name, **kw)
    assert m.patch_size == patch, (
        f"{family}:{name} constructs patch_size={m.patch_size}")

    # forward-smoke one representative per family (the cheapest); the
    # constructor/arch assertions above still cover every name
    fam_names = _names(registry._FAMILIES[family])
    rep = next((n for n in fam_names if "base" in n), fam_names[0])
    if name != rep:
        return

    if family == "mae3d":
        x = jnp.ones((1, 6, img, img, 1))
        params = m.init({"params": jax.random.key(0),
                         "masking": jax.random.key(1)}, x, mask_ratio=0.75)
        loss, _, _, _ = m.apply(params, x, mask_ratio=0.75,
                                rngs={"masking": jax.random.key(2)})
        assert np.isfinite(float(loss))
        return
    if family in ("vit_st", "vit_st_dropout", "slivit"):
        x = jnp.ones((1, 6, img, img, 1))
    elif family == "vit_3dhead":
        x = jnp.ones((1, 6, img, img, 1))
    else:
        x = jnp.ones((1, img, img, 1))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    if isinstance(out, tuple):
        out = out[0]
    assert out.shape == (1, 4) and np.isfinite(float(out.sum()))


def test_retclip_finetune_2d_config_geometry_defaults():
    """The cls fine-tune must accept COEM configs whose vision tower is
    2D (vitl16_retfound2d_* / retfound3dhead_* carry no num_frames key):
    the geometry read defaults num_frames to 60 like cli/retclip.py —
    regression for the KeyError the round-4 review found."""
    from octcubem_tpu.cli import retclip_finetune as rf

    args = rf._build_parser().parse_args(
        ["--model_config", "vitl16_retfound2d_ir"])
    model, vcfg, ecfg = rf._build_model(args, 2)
    assert "num_frames" not in vcfg          # the regression trigger
    frames, osz, esz = (vcfg.get("num_frames", 60), vcfg["img_size"],
                        ecfg["img_size"])    # the CLI's geometry read
    assert frames == 60 and osz > 0 and esz > 0
