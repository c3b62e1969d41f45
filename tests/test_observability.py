"""Tests for the observability subsystem: logging, timers, profiler hooks."""

import logging

import numpy as np
import pytest

from seekr_tpu.utils.logging import get_logger, stage_timer
from seekr_tpu.utils.profiler import profile_region, trace_session


def test_stage_timer_logs_throughput(caplog):
    logger = get_logger("seekr_tpu.timing")
    with caplog.at_level(logging.INFO, logger="seekr_tpu.timing"):
        with stage_timer("unit_test_stage", items=100, unit="things"):
            pass
    text = caplog.text
    assert "unit_test_stage" in text
    assert "things/s" in text


def test_stage_timer_no_items(caplog):
    with caplog.at_level(logging.INFO, logger="seekr_tpu.timing"):
        with stage_timer("bare_stage"):
            pass
    assert "bare_stage" in caplog.text


def test_counter_emits_stage_timing(caplog, ref_data, example_fa):
    from seekr_tpu import KmerCounter

    with caplog.at_level(logging.INFO, logger="seekr_tpu.timing"):
        counter = KmerCounter(example_fa, k=2, silent=True)
        counter.get_counts()
    assert "kmer_counts" in caplog.text
    assert "transcripts/s" in caplog.text


def test_profile_region_and_trace_session(tmp_path):
    # TraceAnnotation must be a no-op-safe context outside a trace
    with profile_region("region"):
        x = np.ones(4).sum()
    assert x == 4
    # trace_session writes profiler artifacts into the target dir
    target = str(tmp_path / "trace")
    with trace_session(target):
        with profile_region("inner"):
            np.ones(8).sum()
    import os

    assert os.path.isdir(target)


def test_trace_session_disabled_is_noop():
    with trace_session(None):
        pass  # no SEEKR_TPU_TRACE -> plain passthrough


def test_no_double_emission_with_app_handlers(monkeypatch, capsys):
    """When the host app configured logging (root handlers exist), the
    package attaches no handler of its own — each record flows exactly
    once through the app's handlers (review finding: records printed
    twice under logging.basicConfig)."""
    import seekr_tpu.utils.logging as slog

    records = []

    class Collect(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    root = logging.getLogger()
    h = Collect()
    root.addHandler(h)
    seekr = logging.getLogger("seekr_tpu")
    old_handlers = list(seekr.handlers)
    seekr.handlers.clear()
    monkeypatch.setattr(slog, "_CONFIGURED", False)
    monkeypatch.setenv("SEEKR_TPU_LOG", "info")
    try:
        log = slog.get_logger("seekr_tpu.once")
        log.info("exactly-once")
        assert records.count("exactly-once") == 1
        assert not seekr.handlers  # nothing attached alongside the app's
        assert capsys.readouterr().err == ""  # no direct stream output
    finally:
        root.removeHandler(h)
        seekr.handlers[:] = old_handlers


def test_stage_timer_logs_on_exception(caplog):
    """The duration is logged even when the timed block raises — that is
    exactly the record a post-mortem needs (review finding)."""
    with caplog.at_level(logging.INFO, logger="seekr_tpu.timing"):
        with pytest.raises(RuntimeError):
            with stage_timer("doomed_stage"):
                raise RuntimeError("boom")
    assert "doomed_stage" in caplog.text
