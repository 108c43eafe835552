"""Parallelism utilities: device mesh, shardings, batch placement.

The reference's only scaling strategy is NCCL DDP (SURVEY §2.9); here the
equivalents are mesh axes:

- ``data``: batch sharding (DDP replacement) — gradients reduce via the
  psum XLA inserts under pjit.
- ``fsdp``: optional parameter sharding for ViT-H+ headroom
  (``fsdp_param_spec`` policy).

The CLIP cross-device feature gather (torch.distributed.nn.all_gather,
open_clip/loss.py:21-65) has no explicit equivalent: computing the global
logit matrix from batch-sharded features under pjit IS the gathered
computation, and it is differentiable by construction
(tests/test_parallel.py proves sharded == unsharded to 1e-5).
"""

from ..core.mesh import (  # noqa: F401
    DATA_AXIS,
    FSDP_AXIS,
    batch_sharding,
    fsdp_param_spec,
    make_mesh,
    replicated,
)
from ..train.mae_engine import shard_batch, replicate_state  # noqa: F401
