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


def make_mesh(n_data: int | None = None, n_fsdp: int = 1, devices=None) -> Mesh:
    """Build a (data, fsdp) mesh. Defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_fsdp
    assert n_data * n_fsdp <= len(devices), (
        f"need {n_data * n_fsdp} devices, have {len(devices)}"
    )
    dev = np.array(devices[: n_data * n_fsdp]).reshape(n_data, n_fsdp)
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
