"""bench.py harness tests — budget safety and the weak-scaling mode.

BENCH_r02 recorded nothing because the old supervisor (5 x 900 s child
timeouts) could not fit the driver's window (VERDICT r2, weak #1 / next #1).
These tests pin the two fixes:

  * a child that wedges AFTER emitting its provisional JSON line still
    yields a harvested number within the bounded attempt budget;
  * the mesh-aware mode (VERDICT r2, next #4) runs distributed_pipeline on
    a virtual CPU mesh end to end and emits the scaling fields.
"""

import json
import os
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _run(env_extra, args=(), timeout=600):
    # strip conftest's 8-virtual-device XLA_FLAGS: now that bench.py
    # honors JAX_PLATFORMS=cpu (axon pins otherwise), a leaked flag
    # would flip the child into auto mesh mode and skip the
    # single-device extras these tests pin
    env = {k: v for k, v in os.environ.items()
           if k not in ("SEEKR_TPU_BENCH_WORKER", "XLA_FLAGS")}
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, BENCH, *args],
        capture_output=True, text=True, timeout=timeout, env=env)


def test_supervisor_harvests_provisional_on_wedge():
    """A worker that emits provisional JSON then hangs must not burn the
    budget: the supervisor kills it at the (short) attempt timeout and
    prints the provisional line instead of retrying a cold compile."""
    t0 = time.time()
    proc = _run({"SEEKR_TPU_BENCH_SELFTEST_HANG": "1",
                 "SEEKR_TPU_BENCH_TIMEOUTS": "5,5"}, timeout=60)
    elapsed = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["provisional"] is True
    assert payload["value"] == 1234.5
    assert payload["vs_baseline"] is not None
    # one 5 s attempt + process overhead, nowhere near a second attempt's
    # worth of budget
    assert elapsed < 30


def test_supervisor_fails_cleanly_when_no_json():
    """No JSON at all within the bounded attempts -> nonzero exit (the
    driver records the failure instead of hanging)."""
    proc = _run({"SEEKR_TPU_BENCH_SELFTEST_HANG": "1",
                 "SEEKR_TPU_BENCH_TIMEOUTS": "1",
                 # the 1 s budget can kill the worker mid-import (a
                 # "timeout"), which would trigger the reachability
                 # probe — pin it to "up" so the broken-bench path
                 # (fail loudly, no recorded fallback) is what's tested
                 "SEEKR_TPU_BENCH_PROBE": "up",
                 # a flag parse error exits before any JSON
                 }, args=("--no-such-flag",), timeout=60)
    assert proc.returncode != 0
    assert not [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]


def test_supervisor_recorded_fallback_when_device_unreachable():
    """All attempts stall with zero JSON AND the device probe fails ->
    the supervisor emits the recorded round-5 measurement, explicitly
    labeled degraded/recorded (a dead tunnel must not leave the
    scoreboard empty)."""
    proc = _run({"SEEKR_TPU_BENCH_SELFTEST_HANG_EARLY": "1",
                 "SEEKR_TPU_BENCH_TIMEOUTS": "2,2",
                 "SEEKR_TPU_BENCH_PROBE": "down"}, timeout=60)
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["degraded"] is True
    assert payload["source"] == "recorded_round5_measurement"
    assert payload["value"] == 1670245.0
    assert "NOT a live run" in payload["note"]


def test_supervisor_no_fallback_when_device_reachable():
    """Stalls with a REACHABLE device are a bench bug: fail loudly
    rather than papering over with recorded numbers."""
    proc = _run({"SEEKR_TPU_BENCH_SELFTEST_HANG_EARLY": "1",
                 "SEEKR_TPU_BENCH_TIMEOUTS": "2",
                 "SEEKR_TPU_BENCH_PROBE": "up"}, timeout=60)
    assert proc.returncode != 0
    assert not [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]


@pytest.mark.slow
def test_cpu_mesh_scaling_mode():
    """--cpu-mesh N runs distributed_pipeline over N virtual CPU devices and
    emits per-chip throughput + strong-scaling efficiency (harness
    validation; the numbers themselves are meaningless on CPU and labeled
    as such)."""
    proc = _run({}, args=("--cpu-mesh", "4"), timeout=600)
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["devices"] == 4
    assert payload["total_tps"] > 0
    assert payload["scaling_efficiency"] > 0
    assert payload["scaling"].startswith("strong")
    assert "virtual CPU mesh" in payload["note"]
    assert "median-of-loops" in payload["method"]


@pytest.mark.slow
def test_cpu_mesh_non_power_of_two_devices():
    """A 6-device mesh (data axis does not divide 256) must round the
    corpus up instead of dying on a GSPMD divisibility error."""
    proc = _run({}, args=("--cpu-mesh", "6"), timeout=600)
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    payload = json.loads(lines[-1])
    assert payload["devices"] == 6


@pytest.mark.slow
def test_pod_preflight_cpu_mesh():
    """`bench.py --pod --cpu-mesh 8` is the turnkey pod dry run (VERDICT
    r4 #5): env validation + mesh construction + the strong-scaling
    harness on the virtual mesh, rc=0, one JSON report.  On real
    multi-chip hardware the identical command produces the SURVEY §6
    measurement."""
    proc = _run({}, args=("--pod", "--cpu-mesh", "8"), timeout=600)
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["metric"] == "pod_preflight"
    assert payload["devices"] == 8
    assert payload["mesh_ok"] is True
    assert payload["virtual_cpu_mesh"] is True
    assert payload["scaling_efficiency"] > 0
    assert payload["efficiency_target"] == 0.85
    # the dry run must NOT assert CPU-mesh efficiency as if it meant
    # something — that claim is reserved for real multi-chip hardware
    assert "efficiency_target_met" not in payload
    assert "harness validation" in payload["note"]


@pytest.mark.slow
def test_tiny_extras_path_emits_all_scoreboard_fields():
    """SEEKR_TPU_BENCH_TINY exercises the full extras pipeline (k_sweep,
    chain with the measured-reference denominator attached, serve) at
    smoke scale on CPU.  Pins that every VERDICT-r4 scoreboard field is
    present and that extras failures would surface as explicit error
    fields, not silently-missing keys."""
    # one generous attempt: the default 300 s first attempt can expire on
    # a loaded CI host, and the supervisor would then (by design) harvest
    # a partially-enriched line missing the very fields this test pins
    proc = _run({"SEEKR_TPU_BENCH_TINY": "1", "JAX_PLATFORMS": "cpu",
                 "SEEKR_TPU_BENCH_TIMEOUTS": "570"},
                args=("--serve",), timeout=600)
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    payload = json.loads(lines[-1])
    # k-sweep: tiny regimes, real numbers
    for key in payload["k_sweep"]:
        assert payload["k_sweep"][key]["tps"] > 0
    # chain: live stages + the RECORDED measured reference denominator
    chain = payload["chain"]
    assert "error" not in chain, chain
    assert set(chain["stage_s"]) == {"find_dist", "find_pval", "adj_pval"}
    assert chain["chain_wall_s"] > 0
    assert chain["ref"]["chain_wall_s"] > 0
    assert "measured" in chain["ref"]["source"]
    # tiny corpus differs from the recorded ref run -> ratio withheld
    assert chain["wall_ratio"] is None
    # serve: interleaved A/B medians
    serve = payload["serve"]
    assert "error" not in serve, serve
    assert serve["q1_p50_ms"] > 0
    assert serve["q128_topk10_seqs_s"] > 0
    assert "interleaved" in serve["method"]


def test_worker_skips_extras_when_budget_exhausted():
    """A worker whose attempt budget is already consumed must mark every
    extra as skipped (and still emit valid JSON) rather than running
    past its supervisor's kill timer."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.update({"SEEKR_TPU_BENCH_WORKER": "1", "SEEKR_TPU_BENCH_TINY": "1",
                "JAX_PLATFORMS": "cpu", "SEEKR_TPU_BENCH_BUDGET_S": "0.01"})
    proc = subprocess.run([sys.executable, BENCH, "--serve"],
                          capture_output=True, text=True, timeout=600,
                          env=env)
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    payload = json.loads(lines[-1])
    for name in ("k_sweep", "chain", "serve"):
        assert "skipped" in payload[name], (name, payload[name])


def test_extras_error_is_contained():
    """A crashing extra must become an explicit error field in the same
    JSON line, not kill the run (the headline number survives)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod2", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    emitted = []
    bench._emit = emitted.append

    def boom():
        raise RuntimeError("synthetic extra failure")

    bench.bench_k_sweep = boom
    bench.bench_chain = lambda: {"ok": True}
    payload = {"value": 1.0}
    bench._run_extras(payload, serve_enabled=False)
    assert payload["k_sweep"] == {"error": "RuntimeError: synthetic extra "
                                           "failure"}
    assert payload["chain"] == {"ok": True}
    # re-emitted after each extra so a timeout harvests what completed
    assert len(emitted) == 2


def test_formulation_ceiling_model():
    """The ceiling emitted next to mfu_wall_best (VERDICT r4 weak #2)
    must follow from the FLOP shares and the two stage rates — and sit
    in the algorithm-bound ~0.3 band that explains the headline MFU."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    bases, lengths = bench.synth_corpus(m=2048, l_min=512, l_max=2048)
    out = bench._formulation_ceiling(bases, lengths, peak_tflops=197.0)
    ceil = out["mfu_formulation_ceiling"]
    # hand-recompute from the model's own definition
    windows = sum(max(int(n) - 5, 0) for n in lengths)
    f_count = 2 * 4**6 * windows
    f_pearson = 2 * 4**6 * 2048 * 2048
    t_ideal = f_count / 83.5e12 + f_pearson / (197.0 / 3 * 1e12)
    expect = (f_count + f_pearson) / (t_ideal * 197.0e12)
    assert abs(ceil - expect) < 1e-3
    # algorithm-bound band: far below 1.0 by construction, far above the
    # dispatch floor; mfu_wall_best ~0.23 reads as ~0.65-0.8 of this
    assert 0.25 < ceil < 0.45
    shares = out["stage_flops_share"]
    assert abs(shares["count"] + shares["pearson"] - 1.0) < 0.01
