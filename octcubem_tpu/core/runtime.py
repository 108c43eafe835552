"""Process-level JAX runtime setup shared by every CLI entry point.

The joint pretrain's 2D mask-ratio schedule gives each epoch its own
visible-token shape, so a ViT-L run compiles a fresh XLA program per
epoch (~4-6 min each on the v5e).  Within one process those compiles
happen once, but a killed-and-resumed run (cli/pretrain --resume) pays
them all again unless the persistent compilation cache is on — the
round-4 soak drive measured 265-340 s first-steps on every resumed
epoch for exactly this reason.  The bench/ablation scripts always set
the cache explicitly; this makes the production CLIs do the same.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "octcubem_tpu", "xla")

_active: str | None = None


def setup_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache for this process.

    Directory resolution: explicit argument, else $OCTCUBEM_CACHE_DIR
    (empty string disables), else ~/.cache/octcubem_tpu/xla.  Safe to
    call more than once (the first call wins; later calls return the
    active dir) and before/after jax import; must run before the first
    jit compile to have any effect on it.  Returns the cache dir in
    use, or None when disabled.
    """
    global _active
    if _active is not None:
        return _active
    env = os.environ.get("OCTCUBEM_CACHE_DIR")
    if cache_dir is None:
        cache_dir = env if env is not None else _DEFAULT_CACHE_DIR
    if not cache_dir:          # explicit opt-out
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # only persist compiles worth persisting; tiny graphs recompile
    # faster than they deserialize
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _active = cache_dir
    return cache_dir
