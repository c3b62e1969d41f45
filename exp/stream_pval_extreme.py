"""Extreme-scale pval-chain demonstration (VERDICT r3 next-round item 1).

Runs the FULL streamed chain at a scale where the in-memory path (and the
reference, seekr/find_pval.py:126-140 + adj_pval.py:93-129) is simply
impossible on this machine:

  1. synthesize an m-transcript corpus (fixed seed),
  2. find_pval(corpus, corpus) STREAMED -> pvals.npy float32 [m, m]
     (self-pval => symmetric),
  3. adj_pval_stream(pvals.npy, fdr_bh) -> adj.npy,
  4. record wall time per stage + peak RSS (VmHWM) in a JSON line.

At m=100k the p-value matrix is 1e10 cells = 40 GB float32 — the
in-memory chain would need the float32 matrix + a float64 copy + the
sort permutation + corrected vector (~200+ GB more than this box has);
the streamed chain holds one tile / one bucket at a time.

Usage:  python exp/stream_pval_extreme.py [m] [k] [--keep]
        (defaults m=100000 k=6; scratch + artifacts under
         SEEKR_TPU_SCRATCH or /tmp, deleted afterwards unless --keep)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # 40 GB fetches would drown the
# TPU tunnel (~3 MB/s, BASELINE.md); the point here is memory behavior,
# not FLOPs — the tile math is identical on either backend.

DIGIT2CHAR = np.array(list("AGTC"))


def vm_peak_gb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1e6
    return float("nan")


def disk_free_gb(path) -> float:
    st = os.statvfs(path)
    return st.f_bavail * st.f_frsize / 1e9


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    keep = "--keep" in sys.argv
    # --defaults: no disk-saving overrides — auto symmetric detection
    # (one extra full read) and the float64 output artifact, i.e. the
    # exact path a production `seekr_adj_pval -bi` takes
    defaults = "--defaults" in sys.argv
    m = int(args[0]) if args else 100_000
    k = int(args[1]) if len(args) > 1 else 6

    work = os.path.join(os.environ.get("SEEKR_TPU_SCRATCH", "/tmp"),
                        f"pval_extreme_{m}")
    os.makedirs(work, exist_ok=True)
    print(f"extreme chain: m={m}, k={k}, work={work}, "
          f"disk_free={disk_free_gb(work):.0f} GB", flush=True)

    rng = np.random.default_rng(0)
    stages = {}

    t0 = time.time()
    lens = rng.integers(400, 1200, m)
    seqs = ["".join(DIGIT2CHAR[rng.integers(0, 4, n)]) for n in lens]
    fa = os.path.join(work, "corpus.fa")
    with open(fa, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">s{i}\n{s}\n")
    del seqs
    mean_p = os.path.join(work, "mean.npy")
    std_p = os.path.join(work, "std.npy")
    np.save(mean_p, rng.uniform(0.5, 2.0, 4 ** k))
    np.save(std_p, rng.uniform(0.5, 2.0, 4 ** k))
    stages["synth_s"] = round(time.time() - t0, 1)
    print(f"synth: {stages['synth_s']}s  rss={vm_peak_gb():.1f} GB",
          flush=True)

    t0 = time.time()
    from seekr_tpu.stats.find_pval import find_pval

    pvals_npy = os.path.join(work, "pvals.npy")
    out = find_pval(fa, fa, mean_p, std_p, k,
                    [("norm", 0.02, (0.0, 0.3))], stream=True,
                    npy_out=pvals_npy)
    assert out is None
    stages["find_pval_s"] = round(time.time() - t0, 1)
    stages["pvals_gb"] = round(os.path.getsize(pvals_npy) / 1e9, 1)
    print(f"find_pval streamed: {stages['find_pval_s']}s, "
          f"{stages['pvals_gb']} GB artifact, rss={vm_peak_gb():.1f} GB",
          flush=True)

    t0 = time.time()
    from seekr_tpu.stats.stream_adj import adj_pval_stream

    adj_npy = os.path.join(work, "adj.npy")
    overrides = ({} if defaults else dict(
        symmetric=True,        # self-pval is symmetric by construction;
        # the tiled check is bounded but costs one extra full read
        out_dtype=np.float32,  # disk headroom at m=100k (module doc)
        unlink_input=True))
    adj_pval_stream(pvals_npy, "fdr_bh", out_npy=adj_npy,
                    **overrides,
                    progress=lambda s: print(
                        f"  adj: {s} (t+{time.time() - t0:.0f}s, "
                        f"rss={vm_peak_gb():.1f} GB)", flush=True))
    stages["adj_pval_s"] = round(time.time() - t0, 1)
    stages["adj_gb"] = round(os.path.getsize(adj_npy) / 1e9, 1)

    # spot-check: corrected values are in [0,1] upper / NaN lower+diag
    mm = np.load(adj_npy, mmap_mode="r")
    probe = np.asarray(mm[:4])
    assert np.isnan(probe[0, 0]) and np.isnan(probe[3, 2])
    finite = probe[0, 1:]
    assert ((finite >= 0) & (finite <= 1)).all()
    tail = np.asarray(mm[m - 2:])
    assert np.isnan(tail[1]).all()  # last row: all lower-triangle
    del mm, probe, tail

    result = {
        "metric": "streamed_pval_chain_extreme",
        "m": m, "k": k, "cells": m * m,
        "peak_rss_gb": round(vm_peak_gb(), 2),
        "matrix_gb_f32": round(m * m * 4 / 1e9, 1),
        "mode": "defaults" if defaults else "overrides",
        **stages,
    }
    print(json.dumps(result), flush=True)
    if not keep:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
