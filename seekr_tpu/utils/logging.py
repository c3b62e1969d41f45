"""Structured logging + per-stage timing.

The reference has only bare prints; the rebuild adds an opt-in structured
logger and stage timers that report throughput (transcripts/s, bases/s) —
the observability subsystem called out in SURVEY.md section 5.

Set SEEKR_TPU_LOG=debug|info|warning to control verbosity (default warning,
so CLI output matches the quiet reference behavior).
"""

from __future__ import annotations

import contextlib
import logging
import os
import threading
import time

_CONFIGURED = False
_CONFIGURE_LOCK = threading.Lock()


def get_logger(name: str = "seekr_tpu") -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        # double-checked under a lock: concurrent first calls (e.g. a
        # worker thread and the main pipeline) must not attach two
        # handlers, which would double every log line for the process
        with _CONFIGURE_LOCK:
            if not _CONFIGURED:
                level = os.environ.get("SEEKR_TPU_LOG", "warning").upper()
                root = logging.getLogger("seekr_tpu")
                if not logging.getLogger().handlers:
                    # standalone process (CLI): attach our own handler
                    # and own the output.  When the HOST APP configured
                    # logging (root handlers exist — including pytest's
                    # caplog), attach nothing and let propagation
                    # deliver each record exactly once through the
                    # app's handlers instead of printing it twice.
                    handler = logging.StreamHandler()
                    handler.setFormatter(logging.Formatter(
                        "%(asctime)s %(name)s %(levelname)s %(message)s",
                        "%H:%M:%S"))
                    root.addHandler(handler)
                    root.propagate = False
                root.setLevel(getattr(logging, level, logging.WARNING))
                _CONFIGURED = True
    return logging.getLogger(name)


@contextlib.contextmanager
def stage_timer(stage: str, items: int | None = None, unit: str = "items"):
    """Context manager logging wall time (and throughput if items given)."""
    log = get_logger("seekr_tpu.timing")
    t0 = time.perf_counter()
    try:
        yield
    finally:
        # log even when the timed block raises: the duration before an
        # OOM/abort is exactly the observability data a post-mortem needs
        dt = time.perf_counter() - t0
        if items:
            log.info("%s: %.3fs (%.1f %s/s)", stage, dt,
                     items / max(dt, 1e-9), unit)
        else:
            log.info("%s: %.3fs", stage, dt)
