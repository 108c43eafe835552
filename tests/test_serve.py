"""Inference server (cli/serve.py): HTTP roundtrip against a frozen AOT
artifact on an ephemeral port."""

import io
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow


def _post_npy(url, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(url, data=buf.getvalue(), method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_serve_aot_roundtrip(tmp_path):
    from octcubem_tpu.models.vit_st import VisionTransformerST
    from octcubem_tpu.compat.aot import export_serving_artifact
    from octcubem_tpu.data.transforms import create_3d_transforms
    from octcubem_tpu.cli import serve

    model = VisionTransformerST(
        num_frames=6, t_patch_size=3, img_size=32, in_chans=1,
        num_classes=4, embed_dim=32, depth=2, num_heads=2,
        head_type="dropout", global_pool=True, attn_impl="naive")
    x0 = jnp.zeros((1, 6, 32, 32, 1), jnp.float32)
    params = model.init(jax.random.key(1), x0)
    artifact = str(tmp_path / "m.octaot")
    export_serving_artifact(lambda x: model.apply(params, x), (x0,),
                            artifact, meta={"nb_classes": 4,
                                            "quant": "none"})

    started = threading.Event()
    box = []
    th = threading.Thread(
        target=serve.main,
        args=(["--aot", artifact, "--port", "0"], started, box),
        daemon=True)
    th.start()
    assert started.wait(timeout=120), "server did not start"
    httpd = box[0]
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read().decode())
        assert health["status"] == "ok" and health["num_frames"] == 6

        # raw volume: server applies the val transform + /255
        rng = np.random.default_rng(3)
        vol = (rng.random((6, 40, 40)) * 255).astype(np.float32)
        code, out = _post_npy(base + "/predict", vol)
        assert code == 200, out
        assert len(out["probs"][0]) == 2  # nb_classes 4 -> 2 disease pairs
        assert all(np.isfinite(p) for p in out["probs"][0])

        # the server's answer must match the live model on the same
        # preprocessing
        _, val_t = create_3d_transforms(32, 6, RandFlipd_prob=0)
        v = val_t(vol) / 255.0
        logits = np.asarray(model.apply(
            params, jnp.asarray(v[None, ..., None], jnp.float32)))
        logits = logits.reshape(1, -1, 2).astype(np.float32)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        ref = (e / e.sum(-1, keepdims=True))[0, :, 1]
        np.testing.assert_allclose(out["probs"][0], ref, atol=1e-4)

        # preprocessed path (?raw=0) with the exact shape
        code, out2 = _post_npy(base + "/predict?raw=0",
                               v.astype(np.float32))
        assert code == 200, out2
        np.testing.assert_allclose(out2["probs"][0], ref, atol=1e-4)

        # error paths: wrong preprocessed shape, bad body, bad route
        code, err = _post_npy(base + "/predict?raw=0", vol)
        assert code == 400 and "must be" in err["error"]
        req = urllib.request.Request(base + "/predict", data=b"garbage",
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # oversized body: rejected by the Content-Length cap BEFORE
        # buffering (413) — claim a huge length, send a tiny body
        req = urllib.request.Request(
            base + "/predict", data=b"x",
            headers={"Content-Length": str(serve.MAX_BODY_BYTES + 1)},
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 413"
        except urllib.error.HTTPError as e:
            assert e.code == 413
        # negative Content-Length must NOT bypass the cap (rfile.read(-1)
        # would buffer until EOF — the unbounded read the cap prevents)
        req = urllib.request.Request(
            base + "/predict", data=b"x",
            headers={"Content-Length": "-1"}, method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            urllib.request.urlopen(base + "/nope", timeout=30)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
        th.join(timeout=30)
