"""Profiling hooks — jax.profiler traces + named stage annotations.

The observability subsystem from SURVEY.md section 5 ("Rebuild: jax.profiler
traces + per-stage timing").  Opt-in via env or explicit calls:

  SEEKR_TPU_TRACE=/tmp/trace  -> every ``profile_region`` runs under a
                                 jax.profiler trace written there
  profile_region("counts")    -> TraceAnnotation visible in the trace viewer
"""

from __future__ import annotations

import contextlib
import os

_TRACE_DIR = os.environ.get("SEEKR_TPU_TRACE")
_ACTIVE = False


@contextlib.contextmanager
def trace_session(trace_dir: str | None = None):
    """Collect a jax.profiler trace for the enclosed region."""
    global _ACTIVE
    import jax

    target = trace_dir or _TRACE_DIR
    if not target or _ACTIVE:
        yield
        return
    _ACTIVE = True
    try:
        with jax.profiler.trace(target):
            yield
    finally:
        _ACTIVE = False


@contextlib.contextmanager
def profile_region(name: str):
    """Named annotation inside a trace (no-op overhead when not tracing)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
