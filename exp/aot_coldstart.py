"""CLI cold-start measurement: AOT executable store, cold vs warm process.

VERDICT r2 item 3 ("weak #3"): a fresh process running the 13k-scale
find_pval chain paid ~21 s of backend compile + fetches out of 23.6 s
total.  Round 3's utils/aot.py stores serialized compiled executables on
disk; this harness measures the real ``find_pval`` stage in TWO fresh
child processes — the first cold (empty store, pays the compiles and
populates it), the second warm (loads executables, skips every backend
compile) — and prints both wall times plus the in-child stage time.

Run: python exp/aot_coldstart.py [--query 1000] [--fresh]
  --fresh wipes the AOT store first for a true cold start.

The child is the measurement unit because the store's whole point is
cross-PROCESS reuse; in-process jit caching would mask it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKDIR = "/tmp/seekr_aot_coldstart"
STORE = os.path.join(WORKDIR, "aot_store")
K = 6


def _setup(query):
    from exp.scale_chain import synth_fasta

    os.makedirs(WORKDIR, exist_ok=True)
    q1 = os.path.join(WORKDIR, "q1.fa")
    q2 = os.path.join(WORKDIR, "q2.fa")
    if not os.path.exists(q1):
        synth_fasta(q1, query, seed=1)
        synth_fasta(q2, query, seed=2)
    rng = np.random.default_rng(0)
    np.save(os.path.join(WORKDIR, "mean.npy"),
            rng.uniform(0.0, 2.0, 4 ** K).astype(np.float64))
    np.save(os.path.join(WORKDIR, "std.npy"),
            rng.uniform(0.5, 2.0, 4 ** K).astype(np.float64))


def _child():
    """One fresh-process find_pval run; prints a JSON line with timings."""
    t_start = time.perf_counter()
    from seekr_tpu.stats.find_dist import fit_distributions
    from seekr_tpu.stats.find_pval import find_pval

    rng = np.random.default_rng(3)
    fitres = fit_distributions(rng.normal(0.0, 0.2, 2000), ["norm"],
                               statsmethod="ks")
    t_imports = time.perf_counter() - t_start

    t0 = time.perf_counter()
    pvals = find_pval(os.path.join(WORKDIR, "q1.fa"),
                      os.path.join(WORKDIR, "q2.fa"),
                      os.path.join(WORKDIR, "mean.npy"),
                      os.path.join(WORKDIR, "std.npy"),
                      K, fitres=fitres[:1], progress_bar=False)
    t_pval = time.perf_counter() - t0
    print(json.dumps({
        "find_pval_s": round(t_pval, 2),
        "imports_fit_s": round(t_imports, 2),
        "total_s": round(time.perf_counter() - t_start, 2),
        "shape": list(pvals.shape),
        "store_files": len([f for f in os.listdir(STORE)
                            if f.endswith(".pkl")])
        if os.path.isdir(STORE) else 0,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", type=int, default=1000)
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the AOT store for a true cold start")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()

    if args.child:
        _child()
        return

    _setup(args.query)
    if args.fresh and os.path.isdir(STORE):
        shutil.rmtree(STORE)

    env = {**os.environ, "SEEKR_TPU_AOT": STORE}
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--query", str(args.query)],
            env=env, capture_output=True, text=True, timeout=1200)
        wall = time.perf_counter() - t0
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("{")]
        if proc.returncode != 0 or not line:
            print(f"[{label}] FAILED rc={proc.returncode}\n"
                  f"{proc.stderr[-800:]}")
            return
        stats = json.loads(line[-1])
        print(f"[{label}] process wall {wall:.1f} s | find_pval "
              f"{stats['find_pval_s']} s | store files "
              f"{stats['store_files']}")


if __name__ == "__main__":
    main()
