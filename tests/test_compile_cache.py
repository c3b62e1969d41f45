"""Persistent-compile-cache setup (utils/compile_cache.py): env routing,
idempotence, and the off switch.  jax.config state is restored afterwards
so the rest of the suite sees its original cache configuration."""

import jax
import pytest

from seekr_tpu.utils import compile_cache


@pytest.fixture
def fresh_cache_module(monkeypatch):
    monkeypatch.setattr(compile_cache, "_DONE", False)
    before = jax.config.jax_compilation_cache_dir
    before_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", before)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      before_min)


def test_cache_dir_from_env(tmp_path, monkeypatch, fresh_cache_module):
    target = tmp_path / "xla_cache"
    monkeypatch.setenv("SEEKR_TPU_COMPILE_CACHE", str(target))
    compile_cache.enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == str(target)
    assert target.is_dir()  # created on demand


def test_off_switch_leaves_config_untouched(monkeypatch,
                                            fresh_cache_module):
    before = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("SEEKR_TPU_COMPILE_CACHE", "off")
    compile_cache.enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == before


def test_idempotent_after_first_call(tmp_path, monkeypatch,
                                     fresh_cache_module):
    first = tmp_path / "first"
    monkeypatch.setenv("SEEKR_TPU_COMPILE_CACHE", str(first))
    compile_cache.enable_compilation_cache()
    # a second call (e.g. CLI + library both enabling) must not rebind
    monkeypatch.setenv("SEEKR_TPU_COMPILE_CACHE", str(tmp_path / "second"))
    compile_cache.enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == str(first)
