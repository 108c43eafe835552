"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware.

Note: this machine's sitecustomize imports jax at interpreter start (axon
TPU plugin), so the JAX_PLATFORMS env var is already latched — we must go
through jax.config instead.  XLA_FLAGS is still read lazily at backend
initialization, which hasn't happened yet when conftest runs.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Test-env opt-in: the BPE parity test loads OpenAI's public merge table
# at runtime (the package itself searches only $OCTCUBEM_BPE_VOCAB, a
# file next to models/, or an installed open_clip/clip — never a
# hardcoded checkout path).  Point the env var at the colocated copy
# when present so the parity test runs instead of skipping.
_bpe = "/root/reference/retinal-COEM/src/open_clip/bpe_simple_vocab_16e6.txt.gz"
if "OCTCUBEM_BPE_VOCAB" not in os.environ and os.path.isfile(_bpe):
    os.environ["OCTCUBEM_BPE_VOCAB"] = _bpe
