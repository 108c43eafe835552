"""Device mesh + sharding helpers.

The reference scales only by data parallelism over NCCL DDP
(SURVEY.md §2.9); the TPU-native equivalent is a jax.sharding.Mesh with a
``data`` axis for batch sharding and an optional ``fsdp`` axis for
parameter sharding headroom (ViT-H and beyond).  XLA emits the ICI
collectives; nothing here manages processes explicitly.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
SP_AXIS = "sp"


def make_mesh(n_data: int | None = None, n_fsdp: int = 1, devices=None,
              n_sp: int = 1) -> Mesh:
    """Build a (data, fsdp[, sp]) mesh. Defaults to all devices on the
    data axis.  n_sp > 1 appends a sequence-parallel axis (innermost, so
    sp groups ride the fastest ICI links)."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_fsdp * n_sp)
    if n_data < 1:
        raise ValueError(
            f"mesh needs at least n_fsdp*n_sp = {n_fsdp * n_sp} devices, "
            f"have {len(devices)} (n_data would be 0)")
    need = n_data * n_fsdp * n_sp
    assert need <= len(devices), (
        f"need {need} devices, have {len(devices)}"
    )
    if n_sp > 1:
        dev = np.array(devices[:need]).reshape(n_data, n_fsdp, n_sp)
        return Mesh(dev, (DATA_AXIS, FSDP_AXIS, SP_AXIS))
    dev = np.array(devices[:need]).reshape(n_data, n_fsdp)
    return Mesh(dev, (DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_spec(path: tuple, leaf) -> P:
    """Shard the largest dim of big weights over fsdp; replicate the rest.

    Simple size-threshold policy: kernels with >= 2**20 elements get their
    longest axis sharded.  This is optional headroom — ViT-L fits replicated.
    """
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 2 and int(np.prod(shape)) >= 2**20:
        axis = int(np.argmax(shape))
        spec = [None] * len(shape)
        spec[axis] = FSDP_AXIS
        return P(*spec)
    return P()
