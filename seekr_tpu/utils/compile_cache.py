"""Persistent XLA compilation cache setup.

First compilation of each (rows, length) bucket shape costs 20-60s on TPU;
enabling JAX's persistent compilation cache makes every later process reuse
the compiled executables.  Called automatically by the CLI entry points;
opt out with SEEKR_TPU_COMPILE_CACHE=off, redirect with
SEEKR_TPU_COMPILE_CACHE=<dir>.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/seekr_tpu/xla_cache")
_DONE = False


def enable_compilation_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    setting = os.environ.get("SEEKR_TPU_COMPILE_CACHE", "")
    if setting.lower() == "off":
        return
    # expanduser: env files/Dockerfiles/systemd units set the var
    # without shell tilde expansion — a literal './~/...' directory
    # fragments the cache per cwd
    cache_dir = os.path.expanduser(setting) if setting else _DEFAULT_DIR
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort; never break the pipeline
        pass
