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

_ACTIVE = False


def _trace_dir():
    # read at CALL time: setting SEEKR_TPU_TRACE after import must work
    # (the module docstring says 'opt-in via env')
    return os.environ.get("SEEKR_TPU_TRACE")


@contextlib.contextmanager
def trace_session(trace_dir: str | None = None):
    """Collect a jax.profiler trace for the enclosed region."""
    global _ACTIVE
    target = trace_dir or _trace_dir()
    if not target or _ACTIVE:
        yield
        return
    import jax  # deferred: the disabled path must stay jax-free

    _ACTIVE = True
    try:
        with jax.profiler.trace(target):
            yield
    finally:
        _ACTIVE = False


def start_trace_if_configured() -> bool:
    """Start a process-lifetime trace when SEEKR_TPU_TRACE is set.

    Used by the CLI device commands: the trace spans the whole command and
    is stopped at interpreter exit.  Returns whether tracing started.
    """
    global _ACTIVE
    target = _trace_dir()
    if not target or _ACTIVE:
        return False
    import atexit

    import jax

    jax.profiler.start_trace(target)
    _ACTIVE = True
    atexit.register(jax.profiler.stop_trace)
    return True


@contextlib.contextmanager
def profile_region(name: str):
    """Named annotation inside a trace (no-op overhead when not tracing)."""
    if not _ACTIVE:
        # jax-free when no trace is active: host-only CLI paths must not
        # pay the jax import (or require jax at all) for a no-op
        yield
        return
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
