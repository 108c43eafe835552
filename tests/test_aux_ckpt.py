import numpy as np
import jax
import jax.numpy as jnp

from octcubem_tpu.models.aux_towers import SimpleTokenizer, TextTransformer
from octcubem_tpu.core import checkpoint as ckpt


def test_tokenizer():
    tok = SimpleTokenizer()
    out = tok(["macular degeneration", "diabetic retinopathy stage 2"])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.sot
    assert (out == tok.eot).sum() == 2
    # deterministic
    np.testing.assert_array_equal(out, tok(
        ["macular degeneration", "diabetic retinopathy stage 2"]))


def test_text_transformer():
    tok = SimpleTokenizer()
    tokens = jnp.asarray(tok(["oct volume of left eye", "fundus image"]))
    m = TextTransformer(width=32, depth=2, heads=2, output_dim=16)
    params = m.init(jax.random.key(0), tokens)
    out = m.apply(params, tokens)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_experimental_towers_raise():
    from octcubem_tpu.models import aux_towers
    import pytest
    with pytest.raises(NotImplementedError):
        aux_towers.perceiver()
    with pytest.raises(NotImplementedError):
        aux_towers.focalnet()


def test_checkpoint_save_restore_delete(tmp_path):
    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(3)}
    d = str(tmp_path / "ck")
    for step in (0, 1, 2):
        ckpt.save_checkpoint(d, step, state, {"epoch": step})
    assert ckpt.latest_step(d) == 2
    restored, extra, step = ckpt.restore_checkpoint(d, state)
    assert step == 2 and extra["epoch"] == 2
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(state["w"]))
    deleted = ckpt.delete_recent_checkpoints(d, 2)
    assert deleted == [2, 1]
    assert ckpt.latest_step(d) == 0
