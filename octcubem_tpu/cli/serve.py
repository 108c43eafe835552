"""Minimal production inference server for the OCT classifier.

Completes the deployment story beyond the reference (whose serving
surface is a notebook, inference_OCTCube.ipynb): load a frozen AOT
artifact (compat/aot.py — no model code needed) or a torch/orbax
checkpoint, and serve 8-disease probabilities over plain HTTP with
stdlib-only dependencies.

    python -m octcubem_tpu.cli.serve --aot model.octaot --port 8476
    python -m octcubem_tpu.cli.serve --ckpt OCTCube_multitask_cls.pth

Endpoints:
  GET  /healthz   -> {"status": "ok", ...model meta}
  POST /predict   body = .npy bytes (np.save) of one volume [T, H, W]
                  (raw frames; server applies the val transform + /255)
                  or preprocessed [T, H, W] floats with the query
                  ?raw=0.  Response: {"probs": [[p_disease...]],
                  "latency_ms": ...}

Design notes (TPU serving):
- batch 1 is both the latency and throughput optimum on v5e
  (NOTES_ROUND3.md serving benchmark), so requests run individually —
  no batching queue to tune.
- the device serializes work anyway; a lock keeps request handling
  simple and fair under ThreadingHTTPServer.
- the forward is warmed at startup so the first request pays no
  compile.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

DISEASES = ["DME", "AMD", "POAG", "EPM", "DR", "VD", "RAO_RVO", "RNV"]

# request-body cap: a raw in-house volume is 61x512x1024 fp64 ≈ 256 MB;
# anything past that is a stray upload, not a scan — reject before
# buffering it into host RAM (413)
MAX_BODY_BYTES = 512 * 1024 * 1024


def build_predictor(args):
    """Returns (predict(vol_f32[B,T,H,W,1]) -> logits, meta dict)."""
    import jax
    import jax.numpy as jnp

    if args.aot:
        from ..compat.aot import load_serving_artifact

        fn, meta = load_serving_artifact(args.aot)
        b, t, s = meta["in_shapes"][0][:3]

        def predict(x):
            out = fn(jnp.asarray(x))
            return out[0] if isinstance(out, tuple) else out

        return predict, {"source": args.aot, "batch": b, "num_frames": t,
                         "input_size": s,
                         "nb_classes": meta.get("nb_classes", 16),
                         "quant": meta.get("quant", "none")}

    from ..models.vit_st import VisionTransformerST
    from ..compat.torch_import import load_torch_checkpoint, import_state_dict

    dtype = jnp.float32 if args.precision == "fp32" else jnp.bfloat16
    model_kw = dict(
        num_frames=args.num_frames, t_patch_size=3, img_size=args.input_size,
        in_chans=1, num_classes=args.nb_classes,
        embed_dim=args.embed_dim or 1024, depth=args.depth or 24,
        num_heads=args.num_heads or 16, head_type="dropout",
        global_pool=True, dtype=dtype)
    model = VisionTransformerST(**model_kw, quant=args.quant == "int8")
    fp_model = (VisionTransformerST(**model_kw) if args.quant == "int8"
                else model)
    x0 = jnp.zeros((1, args.num_frames, args.input_size, args.input_size, 1))
    params = jax.jit(fp_model.init)(jax.random.key(0), x0)
    if args.ckpt:
        from ..compat.torch_import import check_geometry_stamp
        check_geometry_stamp(args.ckpt, args.num_heads or 16)
        sd = load_torch_checkpoint(args.ckpt)
        params, _ = import_state_dict(params, sd, strict=False)
    if args.quant == "int8":
        from ..ops.quant import quantize_tree

        params = jax.jit(
            lambda p: {"params": quantize_tree(p["params"])})(params)
    apply = jax.jit(lambda x: model.apply(params, x))

    return apply, {"source": args.ckpt or "random-init", "batch": 1,
                   "num_frames": args.num_frames,
                   "input_size": args.input_size,
                   "nb_classes": args.nb_classes, "quant": args.quant}


def make_handler(predict, meta, val_transform, lock):
    batch = meta["batch"]
    nf, size = meta["num_frames"], meta["input_size"]

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):  # quiet; errors go through _json
            pass

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._json(200, {"status": "ok", **meta})
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if not self.path.startswith("/predict"):
                self._json(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._json(400, {"error": "bad Content-Length"})
                return
            if n <= 0:
                # rfile.read(-1) would buffer until EOF — the unbounded
                # read the cap exists to prevent
                self._json(400, {"error": "missing/invalid Content-Length"})
                return
            if n > MAX_BODY_BYTES:
                # don't buffer an arbitrary-size upload into host RAM:
                # the largest legitimate body is one fp64 raw volume
                self._json(413, {"error": f"body {n} bytes exceeds limit "
                                          f"{MAX_BODY_BYTES}"})
                return
            try:
                vol = np.load(io.BytesIO(self.rfile.read(n)),
                              allow_pickle=False)
            except Exception as e:
                self._json(400, {"error": f"bad .npy body: {e}"})
                return
            if vol.ndim != 3:
                self._json(400, {"error": f"expected [T, H, W], got "
                                          f"{list(vol.shape)}"})
                return
            raw = "raw=0" not in (self.path.split("?", 1) + [""])[1]
            try:
                v = vol.astype(np.float32)
                if raw:
                    v = val_transform(v) / 255.0
                elif v.shape != (nf, size, size):
                    self._json(400, {"error": f"preprocessed volume must be "
                                              f"{[nf, size, size]}, got "
                                              f"{list(v.shape)}"})
                    return
                x = np.zeros((batch, nf, size, size, 1), np.float32)
                x[0] = v[..., None]
                t0 = time.time()
                with lock:
                    logits = np.asarray(predict(x)).astype(np.float32)
                ms = (time.time() - t0) * 1000
                logits = logits[:1].reshape(1, -1, 2)
                e = np.exp(logits - logits.max(-1, keepdims=True))
                probs = (e / e.sum(-1, keepdims=True))[:, :, 1]
                names = (DISEASES if probs.shape[1] == len(DISEASES)
                         else [f"class_{i}" for i in range(probs.shape[1])])
                self._json(200, {"probs": probs.tolist(), "diseases": names,
                                 "latency_ms": round(ms, 2)})
            except Exception as e:  # surface, don't kill the server
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None, started_event=None, server_box=None):
    parser = argparse.ArgumentParser("OCTCube-TPU inference server")
    parser.add_argument("--aot", default=None,
                        help="frozen serving artifact (compat/aot.py)")
    parser.add_argument("--ckpt", default=None,
                        help="torch checkpoint (built live when no --aot)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8476)
    parser.add_argument("--num_frames", type=int, default=48)
    parser.add_argument("--input_size", type=int, default=256)
    parser.add_argument("--nb_classes", type=int, default=16)
    parser.add_argument("--precision", default="bf16")
    parser.add_argument("--quant", choices=["none", "int8"], default="none")
    parser.add_argument("--embed_dim", type=int, default=None)
    parser.add_argument("--depth", type=int, default=None)
    parser.add_argument("--num_heads", type=int, default=None)
    args = parser.parse_args(argv)

    from ..core.runtime import setup_compilation_cache
    setup_compilation_cache()

    from ..data.transforms import create_3d_transforms
    from ..utils.logging import get_logger

    log = get_logger("serve")
    predict, meta = build_predictor(args)
    _, val_t = create_3d_transforms(meta["input_size"], meta["num_frames"],
                                    RandFlipd_prob=0)
    # warm the forward so the first request pays no compile
    t0 = time.time()
    np.asarray(predict(np.zeros((meta["batch"], meta["num_frames"],
                                 meta["input_size"], meta["input_size"], 1),
                                np.float32)))
    log.info(f"model warm in {time.time() - t0:.1f}s ({meta})")

    lock = threading.Lock()
    httpd = ThreadingHTTPServer(
        (args.host, args.port), make_handler(predict, meta, val_t, lock))
    log.info(f"serving on http://{args.host}:{httpd.server_address[1]} "
             f"(POST /predict, GET /healthz)")
    if server_box is not None:
        server_box.append(httpd)
    if started_event is not None:
        started_event.set()
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()


if __name__ == "__main__":
    main()
