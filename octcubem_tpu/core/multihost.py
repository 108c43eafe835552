"""Multi-host (pod) runtime initialization.

Replaces the reference's env-var process-group rendezvous
(torchrun / SLURM / OpenMPI discovery, OCTCube/util/misc.py:225-257 and
retinal-COEM/src/training/distributed.py:35-103).  On TPU pods the JAX
runtime already knows the topology; one call wires the hosts together and
every mesh built afterwards spans all chips.
"""

from __future__ import annotations

import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> dict:
    """Initialize the global JAX runtime across hosts.

    On Cloud TPU pods all arguments are auto-detected.  For CPU/GPU
    clusters pass coordinator/num_processes/process_id explicitly (or via
    JAX_COORDINATOR_ADDRESS etc.).  Safe to call on a single host (no-op).
    Returns a summary dict for logging.
    """
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes > 1 or coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def maybe_initialize() -> dict:
    """CLI-startup hook: join a multi-host cluster when the environment
    asks for one (JAX_NUM_PROCESSES > 1 or JAX_COORDINATOR_ADDRESS set),
    else no-op.  Replaces the reference's unconditional
    ``init_distributed_mode(args)`` call at the top of every main
    (OCTCube/util/misc.py:225-257) — single-host runs never pay for it.
    """
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if nproc > 1 or coord:
        pid = os.environ.get("JAX_PROCESS_ID")
        return initialize(coordinator_address=coord, num_processes=nproc,
                          process_id=int(pid) if pid is not None else None)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def put_tree(mesh, tree, spec_fn=None):
    """Place a pytree of host-replicated arrays as GLOBAL jax.Arrays.

    In a multi-process run ``jax.device_put`` rejects shardings that span
    non-addressable devices; the multi-host way is make_array_from_callback
    with each process providing its addressable shards.  Every process
    must hold the same full host value (e.g. params initialized from the
    same seed).  ``spec_fn(path, leaf) -> PartitionSpec`` chooses the
    sharding per leaf (default: fully replicated) — pass
    ``core.mesh.fsdp_param_spec`` for the size-policy parameter sharding.
    Works unchanged in single-process runs.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def place(path, x):
        if isinstance(x, jax.Array) and jnp.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            # typed PRNG keys: place the raw key data, re-wrap after
            impl = jax.random.key_impl(x)
            placed = place(path, jax.random.key_data(x))
            return jax.random.wrap_key_data(placed, impl=impl)
        x = np.asarray(x)
        spec = spec_fn(path, x) if spec_fn is not None else P()
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map_with_path(place, tree)


def global_batch(mesh, local_array, axis: str = "data"):
    """Assemble a global batch-sharded array from this host's local shard.

    Each host loads ``global_batch_size / process_count`` samples; the
    returned jax.Array is the logical global batch sharded over ``axis``
    of ``mesh`` — the multi-host analogue of the reference's
    DistributedSampler + per-rank DataLoader
    (Pre-training/main_pretrain_oph_joint_2d512_flash_attn.py:361-371).
    Works unchanged (and cheaply) in single-process runs.
    """
    import numpy as np
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    local_array = np.asarray(local_array)
    sharding = NamedSharding(mesh, P(axis))
    global_shape = (local_array.shape[0] * jax.process_count(),
                    *local_array.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, local_array, global_shape)
