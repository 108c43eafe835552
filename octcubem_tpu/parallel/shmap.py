"""shard_map version compatibility shim, shared by sequence.py/tensor.py.

jax moved shard_map to the top level (>=0.8) and renamed check_rep ->
check_vma along the way; resolve the callable and the kwarg name by
signature so any version in the supported range works.
"""

from __future__ import annotations

import inspect as _inspect

import jax

if hasattr(jax, "shard_map"):
    _shard_map_impl = jax.shard_map
else:  # pragma: no cover
    try:
        from jax.sharding import shard_map as _shard_map_impl  # type: ignore
    except ImportError:
        from jax.experimental.shard_map import (  # type: ignore
            shard_map as _shard_map_impl)
_CHECK_KW = ("check_vma" if "check_vma" in
             _inspect.signature(_shard_map_impl).parameters else "check_rep")


def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
    return _shard_map_impl(f, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, **{_CHECK_KW: check_rep})
