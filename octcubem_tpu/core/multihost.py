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
