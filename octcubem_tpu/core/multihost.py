"""Multi-host (pod) runtime initialization and placement.

Replaces the reference's env-var process-group rendezvous
(torchrun / SLURM / OpenMPI discovery, OCTCube/util/misc.py:225-257 and
retinal-COEM/src/training/distributed.py:35-103).  One `initialize()`
call wires the hosts together and every mesh built afterwards spans all
chips; `global_batch`/`put_tree` are the placement contracts that replace
`jax.device_put` (which rejects shardings spanning non-addressable
devices in multi-process runs).
"""

from __future__ import annotations

import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> dict:
    """Initialize the global JAX runtime across hosts.

    On Cloud TPU pods call with NO arguments — jax.distributed.initialize
    auto-detects the topology.  For CPU/GPU clusters pass
    coordinator/num_processes/process_id explicitly (or via the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars,
    picked up by jax itself when the corresponding argument is None).
    Returns a summary dict for logging.
    """
    import jax

    env_nproc = os.environ.get("JAX_NUM_PROCESSES")
    if num_processes is None and env_nproc is not None:
        num_processes = int(env_nproc)
    if process_id is None and (pid := os.environ.get("JAX_PROCESS_ID")):
        process_id = int(pid)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return summary()


def summary() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def maybe_initialize() -> dict:
    """CLI-startup hook: join a multi-host cluster when the environment
    asks for one (JAX_NUM_PROCESSES > 1 or JAX_COORDINATOR_ADDRESS set),
    else no-op — single-host runs never pay for the rendezvous.  On TPU
    pods, where everything is auto-detectable, set JAX_NUM_PROCESSES (or
    call ``initialize()`` directly) to opt in.  Replaces the reference's
    unconditional ``init_distributed_mode(args)`` at the top of every
    main (OCTCube/util/misc.py:225-257).
    """
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if (nproc is not None and int(nproc) > 1) or coord:
        return initialize(coordinator_address=coord)
    return summary()


def announce() -> dict:
    """maybe_initialize + persistent-compile-cache + one status line when
    a cluster formed — the shared CLI-startup block (every training CLI
    calls this)."""
    from .runtime import setup_compilation_cache

    setup_compilation_cache()
    info = maybe_initialize()
    if info["process_count"] > 1:
        print(f"[multihost] process {info['process_index']}/"
              f"{info['process_count']}, {info['global_devices']} "
              "global devices")
    return info


def local_rows(arr):
    """This host's rows of a batch-dim-sharded global array, as numpy,
    in the order this host fed them to ``global_batch``.

    np.asarray on an array spanning non-addressable devices raises in
    multi-process runs; the host-side per-sample reads (SPL hardness,
    recon dumps) must consume only the local shard.  Addressable shards
    are concatenated in global-index order — global_batch lays each
    host's local array out as one contiguous index-ordered slice, so
    this inverts it exactly.  Single-process: plain np.asarray.
    """
    import numpy as np
    import jax

    if jax.process_count() == 1 or (
            hasattr(arr, "is_fully_replicated") and arr.is_fully_replicated):
        return np.asarray(arr)
    # dedupe by global index: rows replicated over other mesh axes (e.g.
    # fsdp) appear once per replica device in addressable_shards
    by_start = {}
    for s in arr.addressable_shards:
        by_start.setdefault(s.index[0].start or 0, s.data)
    return np.concatenate(
        [np.asarray(by_start[k]) for k in sorted(by_start)])


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


def global_batch(mesh, local_array, axis: str = "data",
                 micro_axis: bool = False):
    """Assemble a global batch-sharded array from this host's local shard.

    Each host loads ``global_batch_size / process_count`` samples; the
    returned jax.Array is the logical global batch sharded over ``axis``
    of ``mesh`` — the multi-host analogue of the reference's
    DistributedSampler + per-rank DataLoader
    (Pre-training/main_pretrain_oph_joint_2d512_flash_attn.py:361-371).
    micro_axis=True treats dim 0 as an accumulation axis (replicated) and
    assembles/shards dim 1 instead.  Works unchanged (and cheaply) in
    single-process runs.
    """
    import numpy as np
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    local_array = np.asarray(local_array)
    if micro_axis:
        sharding = NamedSharding(mesh, P(None, axis))
        global_shape = (local_array.shape[0],
                        local_array.shape[1] * jax.process_count(),
                        *local_array.shape[2:])
    else:
        sharding = NamedSharding(mesh, P(axis))
        global_shape = (local_array.shape[0] * jax.process_count(),
                        *local_array.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, local_array, global_shape)
