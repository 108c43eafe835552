"""AOT serving artifacts via jax.export (serialized StableHLO).

Freezes a trained model into ONE deployable file: the jitted forward is
lowered to StableHLO with the weights embedded as constants and
serialized with ``jax.export`` — loading needs jax but NO model code,
architecture config, or checkpoint tree.  This is TPU-native deployment
headroom beyond the reference, whose serving story is a notebook plus a
torch checkpoint that must be re-materialized through the full model
class (inference_OCTCube.ipynb cells 4-10, inference_utils.py:30-39).

An artifact can be lowered for several platforms at once (e.g. tpu +
cpu) so the same file serves on a TPU host and in a CPU canary; the
loader refuses a platform the artifact was not lowered for.

Container format (single file)::

    OCTPU-AOT1\n           magic
    {...json meta...}\n    one line: shapes, dtypes, platforms, user meta
    <raw bytes>            jax.export.Exported.serialize() payload
"""

from __future__ import annotations

import json
import os

MAGIC = b"OCTPU-AOT1\n"


def export_serving_artifact(fn, example_args, path: str,
                            platforms=None, meta: dict | None = None) -> str:
    """Lower ``fn(*example_args)`` and write a serving artifact to *path*.

    fn must close over its weights (e.g. ``lambda x: model.apply(params,
    x)``) so the artifact is self-contained; *example_args* fix the
    (static) input shapes/dtypes.  platforms defaults to the current
    backend; pass e.g. ``("tpu", "cpu")`` for a multi-platform artifact.
    Returns *path*.
    """
    import jax
    from jax import export as jexport

    if platforms is None:
        platforms = (jax.default_backend(),)
    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jax.numpy.shape(a),
                                       jax.numpy.result_type(a)),
        tuple(example_args))
    exp = jexport.export(jax.jit(fn), platforms=list(platforms))(*specs)
    blob = exp.serialize()
    header = dict(meta or {})
    header.update({
        "platforms": list(platforms),
        "in_shapes": [list(s.shape) for s in jax.tree.leaves(specs)],
        "in_dtypes": [str(s.dtype) for s in jax.tree.leaves(specs)],
    })
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(json.dumps(header).encode() + b"\n")
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_serving_artifact(path: str):
    """Load an artifact written by :func:`export_serving_artifact`.

    Returns ``(fn, meta)`` where ``fn`` is the jitted callable (same
    signature as the exported fn, weights baked in) and ``meta`` the
    header dict.  Raises ValueError on a bad container or a platform the
    artifact was not lowered for.
    """
    import jax
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path}: not an OCTPU-AOT1 artifact")
        header = json.loads(f.readline().decode())
        blob = f.read()
    backend = jax.default_backend()
    if backend not in header["platforms"]:
        raise ValueError(
            f"{path}: artifact lowered for {header['platforms']}, but the "
            f"current backend is {backend!r}; re-export with "
            f"platforms=(..., {backend!r})")
    exp = jexport.deserialize(blob)
    return jax.jit(exp.call), header
