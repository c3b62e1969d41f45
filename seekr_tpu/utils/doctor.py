"""Environment health report for production deployments.

The framework spans four runtimes — the JAX/XLA device path, the native
C++ engines, the AOT executable store, and the host Python stack — and
a broken piece usually surfaces as a confusing downstream error (or, on
a wedged TPU tunnel, as a silent hang).  ``seekr_tpu_doctor`` checks
each layer directly and prints one line per check.

The accelerator probe runs in a SUBPROCESS under a timeout: on a dead
or wedged device link, in-process backend init can hang forever (the
failure mode bench.py's supervisor exists for), and a doctor that hangs
while diagnosing a hang is useless.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import List, Tuple

OK = "ok"
WARN = "warn"
FAIL = "fail"


def _versions() -> List[Tuple[str, str, str]]:
    rows = [(OK, "python", sys.version.split()[0])]
    for mod in ("jax", "jaxlib", "numpy", "scipy", "pandas"):
        try:
            m = __import__(mod)
            rows.append((OK, mod, getattr(m, "__version__", "?")))
        except Exception as err:  # pragma: no cover - environment-specific
            rows.append((FAIL, mod, f"not importable: {err}"))
    return rows


def _device_probe(timeout: float) -> Tuple[str, str, str]:
    """Fresh-process device check: backend, device kind, tiny op."""
    # '|'-separated: device_kind strings contain SPACES on the target
    # hardware ('TPU v4', 'Tesla V100-SXM2-16GB'), so a whitespace split
    # would crash the doctor on exactly the devices it exists to check
    probe = (
        "import jax, numpy as np\n"
        "d = jax.devices()\n"
        "x = jax.numpy.ones((8, 8))\n"
        "v = float(np.asarray((x @ x)[0, :1])[0])\n"
        "print(jax.default_backend(), len(d), "
        "getattr(d[0], 'device_kind', '?'), v, sep='|')\n"
    )
    try:
        proc = subprocess.run([sys.executable, "-c", probe],
                              capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        return (FAIL, "device",
                f"probe hung >{timeout:.0f}s (wedged accelerator link? "
                "a fresh process usually recovers; see BASELINE.md)")
    if proc.returncode != 0:
        err = proc.stderr.strip()
        detail = err.splitlines()[-1] if err \
            else f"exit code {proc.returncode}"
        return (FAIL, "device", f"probe failed: {detail}")
    backend, n, kind, val = proc.stdout.strip().split("|", 3)
    status = OK if float(val) == 8.0 else FAIL
    return (status, "device",
            f"backend={backend} devices={n} kind={kind} (8x8 matmul "
            f"{'correct' if status == OK else 'WRONG: ' + val})")


def _native() -> List[Tuple[str, str, str]]:
    try:
        from seekr_tpu import native
    except Exception as err:  # pragma: no cover
        return [(FAIL, "native", f"module not importable: {err}")]
    if not native.native_available():
        return [(WARN, "native",
                 f"C++ engines unavailable (Python fallbacks active): "
                 f"{native.load_error()}")]
    return [(OK, "native",
             "C++ engines loaded (leiden, fastio, csvio, sortops, "
             "statops)")]


def _aot_store() -> Tuple[str, str, str]:
    from seekr_tpu.utils.aot import _DEFAULT_DIR

    setting = os.environ.get("SEEKR_TPU_AOT", "")
    if setting.lower() == "off":
        return (WARN, "aot-store", "disabled (SEEKR_TPU_AOT=off)")
    base = setting if setting and setting.lower() != "on" else _DEFAULT_DIR
    if not os.path.isdir(base):
        return (OK, "aot-store", f"{base}: empty (first run populates it)")
    files = [f for f in os.listdir(base) if f.endswith(".pkl")]
    size = sum(os.path.getsize(os.path.join(base, f)) for f in files)
    return (OK, "aot-store",
            f"{base}: {len(files)} executables, {size / 1e6:.1f} MB")


def _env_knobs() -> List[Tuple[str, str, str]]:
    rows = []
    for var in ("SEEKR_TPU_COUNT_IMPL", "SEEKR_TPU_HOST_SORT",
                "SEEKR_TPU_MATMUL_PRECISION", "SEEKR_TPU_PDIST",
                "SEEKR_TPU_AOT", "SEEKR_TPU_AOT_DEBUG",
                "SEEKR_TPU_COMPILE_CACHE",
                "SEEKR_TPU_TRACE", "SEEKR_TPU_LOG",
                "SEEKR_TPU_CORPUS_BUDGET", "SEEKR_TPU_POD_TIMEOUT",
                "SEEKR_TPU_SCRATCH", "SEEKR_TPU_CHECK_SCATTER"):
        val = os.environ.get(var)
        if val is not None:
            rows.append((WARN, "env", f"{var}={val} (non-default)"))
    if not rows:
        rows.append((OK, "env", "no SEEKR_TPU_* overrides set"))
    return rows


def run_doctor(device_timeout: float = 90.0, skip_device: bool = False,
               out=None) -> bool:
    """Print the report; returns True when no check FAILed."""
    out = out or sys.stdout
    checks: List[Tuple[str, str, str]] = []
    checks.extend(_versions())
    checks.extend(_native())
    checks.append(_aot_store())
    checks.extend(_env_knobs())
    if not skip_device:
        checks.append(_device_probe(device_timeout))

    healthy = True
    for status, name, detail in checks:
        print(f"[{status:4s}] {name:10s} {detail}", file=out)
        healthy &= status != FAIL
    print("doctor: " + ("all checks passed" if healthy
                        else "FAILURES above"), file=out)
    return healthy
