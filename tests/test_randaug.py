import numpy as np
import pytest

from octcubem_tpu.data import randaug
from octcubem_tpu.data.transforms import Transform2DTrain


def _img():
    rng = np.random.default_rng(0)
    return rng.random((32, 32, 3)).astype(np.float32)


@pytest.mark.parametrize("op", [
    randaug.op_autocontrast, randaug.op_equalize, randaug.op_invert,
    randaug.op_posterize, randaug.op_solarize,
])
def test_unsigned_ops_valid_range(op):
    out = op(_img(), 9.0, np.random.default_rng(1))
    assert out.shape == (32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.isfinite(out).all()


@pytest.mark.parametrize("op", [
    randaug.op_contrast, randaug.op_brightness, randaug.op_color,
    randaug.op_sharpness, randaug.op_rotate, randaug.op_shear_x,
    randaug.op_translate_y,
])
def test_signed_ops_both_signs(op):
    img = _img()
    for sign in (1, -1):
        out = op(img, 9.0, np.random.default_rng(1), sign=sign)
        assert out.shape == img.shape
        assert np.isfinite(out).all()


def test_rotate_identity_at_zero():
    img = _img()
    out = randaug.op_rotate(img, 0.0, np.random.default_rng(0), sign=1)
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_rand_augment_deterministic():
    img = _img()
    a = randaug.rand_augment(img, np.random.default_rng(5))
    b = randaug.rand_augment(img, np.random.default_rng(5))
    np.testing.assert_array_equal(a, b)
    c = randaug.rand_augment(img, np.random.default_rng(6))
    assert not np.array_equal(a, c)


def test_random_erasing():
    img = np.zeros((32, 32, 1), np.float32)
    out = randaug.random_erasing(img, np.random.default_rng(0), prob=1.0)
    assert (out != 0).any()


def test_transform2d_train_pipeline():
    rng = np.random.default_rng(0)
    img = rng.random((300, 400)).astype(np.float32)
    t = Transform2DTrain(input_size=64)
    out = t(img, rng=np.random.default_rng(1))
    assert out.shape == (64, 64, 1)
    assert np.isfinite(out).all()


def test_mixup_cutmix():
    rng = np.random.default_rng(0)
    imgs = rng.random((8, 16, 16, 1)).astype(np.float32)
    t = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 8)]
    out, soft = randaug.mixup_cutmix(imgs, t, np.random.default_rng(1))
    assert out.shape == imgs.shape and soft.shape == t.shape
    np.testing.assert_allclose(soft.sum(axis=1), 1.0, rtol=1e-5)
    assert np.isfinite(out).all()
