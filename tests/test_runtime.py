"""core.runtime: persistent-compile-cache setup shared by the CLIs."""

import jax
import pytest

from octcubem_tpu.core import runtime


@pytest.fixture(autouse=True)
def _isolate_runtime_state(monkeypatch):
    """Reset the module's first-call latch and restore the process's
    jax cache config afterwards (other tests must not inherit a
    tmp_path cache dir)."""
    monkeypatch.setattr(runtime, "_active", None)
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)


def test_env_empty_disables(monkeypatch):
    monkeypatch.setenv("OCTCUBEM_CACHE_DIR", "")
    assert runtime.setup_compilation_cache() is None


def test_explicit_dir_sets_config_and_creates(tmp_path):
    d = tmp_path / "xla_cache"
    out = runtime.setup_compilation_cache(str(d))
    assert out == str(d)
    assert d.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(d)
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.0


def test_first_call_wins(tmp_path):
    first = str(tmp_path / "a")
    assert runtime.setup_compilation_cache(first) == first
    # a later call (e.g. a second CLI main in-process) is a no-op
    assert runtime.setup_compilation_cache(str(tmp_path / "b")) == first
    assert jax.config.jax_compilation_cache_dir == first


def test_env_dir_used_when_no_arg(monkeypatch, tmp_path):
    d = tmp_path / "from_env"
    monkeypatch.setenv("OCTCUBEM_CACHE_DIR", str(d))
    assert runtime.setup_compilation_cache() == str(d)
    assert d.is_dir()
