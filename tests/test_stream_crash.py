"""Crash consistency of the streamed artifact writers (VERDICT r4 #8).

Contract: a run killed (SIGKILL) mid-stream leaves the FINAL artifact
path either complete or absent — never a truncated file a downstream
stage could silently consume — and a clean restart produces the correct
artifact.  Matches the robustness bar the serve corpus snapshots already
meet (serve.py temp+os.replace).

Two layers:
  * unit: the writers' .part/publish/discard state machine directly;
  * process: tests/crash_worker.py runs the real adj_pval_stream and
    streamed find_pval paths and is SIGKILLed while blocks are being
    appended (the worker slows appends so the kill lands mid-output
    deterministically), then the same workload re-runs to completion.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pandas as pd
import pytest

from seekr_tpu.io.stream import StreamingCsvWriter, StreamingNpyWriter

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "crash_worker.py")


# -- unit layer --------------------------------------------------------------

def test_npy_writer_publishes_only_on_close(tmp_path):
    path = str(tmp_path / "x.npy")
    w = StreamingNpyWriter(path, (4, 3))
    w.append(np.ones((2, 3), np.float32))
    # mid-stream: only the .part exists
    assert not os.path.exists(path)
    assert os.path.exists(path + ".part")
    w.append(np.ones((2, 3), np.float32))
    w.close()
    assert not os.path.exists(path + ".part")
    assert np.load(path).shape == (4, 3)


def test_npy_writer_discards_on_row_shortfall(tmp_path):
    path = str(tmp_path / "x.npy")
    w = StreamingNpyWriter(path, (4, 3))
    w.append(np.ones((2, 3), np.float32))
    with pytest.raises(AssertionError, match="expected 4 rows"):
        w.close()
    # neither a final nor a lingering partial artifact
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".part")


def test_npy_writer_context_exception_discards(tmp_path):
    path = str(tmp_path / "x.npy")
    with pytest.raises(RuntimeError):
        with StreamingNpyWriter(path, (4, 3)) as w:
            w.append(np.ones((2, 3), np.float32))
            raise RuntimeError("device fell over")
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".part")


def test_csv_writer_publishes_only_on_close(tmp_path):
    path = str(tmp_path / "x.csv")
    w = StreamingCsvWriter(path, columns=["a", "b"], row_labels=["r1", "r2"],
                           fmt="%s")
    w.append(np.ones((1, 2), np.float32))
    assert not os.path.exists(path)
    assert os.path.exists(path + ".part")
    w.append(np.ones((1, 2), np.float32))
    w.close()
    assert not os.path.exists(path + ".part")
    assert pd.read_csv(path, index_col=0).shape == (2, 2)


def test_csv_writer_context_exception_discards(tmp_path):
    path = str(tmp_path / "x.csv")
    with pytest.raises(RuntimeError):
        with StreamingCsvWriter(path, columns=["a"], row_labels=["r"],
                                fmt="%s") as w:
            w.append(np.ones((1, 1), np.float32))
            raise RuntimeError("boom")
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".part")


def test_restart_overwrites_stale_part(tmp_path):
    """A leftover .part from a crashed run must not corrupt a restart."""
    path = str(tmp_path / "x.npy")
    with open(path + ".part", "wb") as fh:
        fh.write(b"garbage from a dead process")
    with StreamingNpyWriter(path, (2, 2)) as w:
        w.append(np.arange(4, dtype=np.float32).reshape(2, 2))
    got = np.load(path)
    np.testing.assert_array_equal(got, [[0, 1], [2, 3]])


# -- process layer (real SIGKILL against the real chain stages) --------------

def _child_env():
    return {k: v for k, v in os.environ.items()
            if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}


def _run_worker(mode, workdir, kill_when=None, timeout=240):
    """Run crash_worker.py; if ``kill_when`` (a path-predicate) is given,
    SIGKILL the child once it holds and return after the kill."""
    proc = subprocess.Popen(
        [sys.executable, WORKER, mode, str(workdir)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_child_env())
    if kill_when is None:
        out, _ = proc.communicate(timeout=timeout)
        assert proc.returncode == 0, out[-2000:]
        assert "CRASH_WORKER_DONE" in out
        return
    deadline = time.time() + timeout
    try:
        while time.time() < deadline:
            if proc.poll() is not None:
                out, _ = proc.communicate()
                pytest.fail("worker finished before the kill landed "
                            "(slow-append pacing broken?):\n" + out[-2000:])
            if kill_when():
                os.kill(proc.pid, signal.SIGKILL)
                proc.wait(timeout=30)
                return
            time.sleep(0.02)
        pytest.fail("kill condition never became true")
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def _part_nonempty(path):
    return os.path.exists(path) and os.path.getsize(path) > 0


@pytest.mark.slow
def test_adj_stream_sigkill_leaves_no_partial_artifact(tmp_path):
    rng = np.random.default_rng(0)
    pvals = rng.uniform(size=(160, 160)).astype(np.float64)
    np.save(tmp_path / "pvals_in.npy", pvals)

    csv_part = str(tmp_path / "adj_out.csv.part")
    _run_worker("adj", tmp_path,
                kill_when=lambda: _part_nonempty(csv_part))

    # complete-or-none: the kill landed while .part grew, so neither
    # final artifact may exist
    assert not os.path.exists(tmp_path / "adj_out.csv")
    assert not os.path.exists(tmp_path / "adj_out.npy")

    # restart on the same inputs (stale .part present) must succeed ...
    _run_worker("adj", tmp_path)
    got = np.load(tmp_path / "adj_out.npy")
    assert not os.path.exists(csv_part)

    # ... and match the in-memory correction bitwise
    from seekr_tpu.stats.adj_pval import adj_pval
    want = adj_pval(pd.DataFrame(pvals), "fdr_bh")
    np.testing.assert_array_equal(got, want.values)
    csv = pd.read_csv(tmp_path / "adj_out.csv", index_col=0)
    np.testing.assert_allclose(csv.values, want.values)


@pytest.mark.slow
def test_pval_stream_sigkill_leaves_no_partial_artifact(tmp_path):
    rng = np.random.default_rng(1)
    letters = np.array(list("AGTC"))
    with open(tmp_path / "q.fa", "w") as fh:
        for i in range(40):
            seq = "".join(letters[rng.integers(0, 4, 120)])
            fh.write(f">S{i}\n{seq}\n")
    np.save(tmp_path / "mean.npy", rng.uniform(1.0, 3.0, 16))
    np.save(tmp_path / "std.npy", rng.uniform(0.5, 1.5, 16))
    np.save(tmp_path / "fitres.npy",
            rng.normal(0.3, 0.2, 2000).astype(np.float32))

    csv_part = str(tmp_path / "pval_out.csv.part")
    _run_worker("pval", tmp_path,
                kill_when=lambda: _part_nonempty(csv_part))
    assert not os.path.exists(tmp_path / "pval_out.csv")
    assert not os.path.exists(tmp_path / "pval_out.npy")

    # restart completes and the streamed artifacts agree with the
    # in-memory (non-streamed) path computed on the SAME (CPU) backend —
    # in-process here would run on the real TPU under
    # SEEKR_TPU_TEST_BACKEND=tpu, whose ~1e-5 r differences move
    # empirical p-values by whole 1/N grid steps
    _run_worker("pval", tmp_path)
    assert not os.path.exists(csv_part)
    _run_worker("pval_mem", tmp_path)
    want = np.load(tmp_path / "pval_want.npy")
    got_csv = pd.read_csv(tmp_path / "pval_out.csv", index_col=0)
    np.testing.assert_allclose(got_csv.values, want, rtol=1e-4, atol=1e-5)
    got_npy = np.load(tmp_path / "pval_out.npy")
    np.testing.assert_allclose(got_npy, want, rtol=1e-4, atol=1e-5)
