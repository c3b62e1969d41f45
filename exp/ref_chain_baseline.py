"""Measured REFERENCE denominator for the downstream stats chain.

VERDICT r4 weak #1 / next-round #1: every chain speedup claim so far
compared this repo against its own earlier implementations.  This script
times the ACTUAL reference implementation (mounted read-only at
/root/reference) on the bench corpus, stage by stage, so BASELINE.md and
bench.py's chain metric carry a *measured* reference denominator:

  find_dist   (seekr/find_dist.py:82  — counts + all-pairs pearson +
               triu + 100k subset + common10 ks fit)
  find_pval   (seekr/find_pval.py:126-133 — fitted branch: the per-cell
               ``1 - distribution.cdf(sim[i, j])`` Python loop, m^2 scipy
               scalar calls; THE dominant chain cost)
  adj_pval    (seekr/adj_pval.py:77-91 — symmetric triu path)

Corpus: bench.py's synthetic GENCODE-lncRNA-like corpus (seed 0, lengths
512..2047) written to fasta — byte-identical generator to the headline
throughput bench, so the chain ratio and the throughput ratio describe
the same workload.

statsmodels is not installed in this container; the reference's
``adj_pval`` delegates its math to ``statsmodels.stats.multitest
.multipletests``.  The shim below routes that one call to this repo's
in-house ``seekr_tpu.stats.multitest.multipletests`` (same algorithms,
oracle-tested; identical corrected p-values for all ten methods) with
the NATIVE ENGINE DISABLED (pure numpy) so the reference side is timed
with stock-numpy-grade machinery — everything else in the reference's
adj_pval (pandas round-trips, triu extraction, DataFrame fill) is the
reference's own code.  The shimmed stage is labeled in the output.

kmer_leiden is EXCLUDED from the measured chain: the reference delegates
its hot loop to python-igraph (C) + leidenalg (C++), neither of which is
installed or installable here; timing a stand-in would not be a
reference measurement.  The repo-side Leiden numbers live in BASELINE.md
as absolute measurements only.

Usage:
  python exp/ref_chain_baseline.py --side ref  --m 2048 --reps 3
  python exp/ref_chain_baseline.py --side ours --m 2048 --reps 3

The two sides intentionally run in separate processes: the ref side
never imports jax (pure CPU, like real reference usage); the ours side
uses whatever backend jax selects (TPU in a live session).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"

SHIM = '''\
"""statsmodels.stats.multitest shim (see exp/ref_chain_baseline.py).

Routes multipletests to seekr_tpu's in-house implementation with the
native engine disabled, so the reference adj_pval can be timed without
statsmodels installed.
"""
import os
os.environ["SEEKR_TPU_HOST_SORT"] = "numpy"  # stock-numpy-grade timing
from seekr_tpu.stats.multitest import multipletests  # noqa: F401
'''


def write_corpus(path, m):
    """bench.py's corpus, as a fasta file — delegated to the SAME writer
    bench.py's chain metric uses, so the two measurements cannot silently
    diverge on corpus bytes (the ratio's premise)."""
    import bench

    bench.write_corpus_fasta(path, m)
    _, lengths = bench.synth_corpus(m=m)
    return int(lengths.sum())


def install_statsmodels_shim(workdir):
    shim_root = os.path.join(workdir, "_statsmodels_shim")
    pkg = os.path.join(shim_root, "statsmodels", "stats")
    os.makedirs(pkg, exist_ok=True)
    for init in (os.path.join(shim_root, "statsmodels", "__init__.py"),
                 os.path.join(pkg, "__init__.py")):
        with open(init, "w") as fh:
            fh.write("")
    with open(os.path.join(pkg, "multitest.py"), "w") as fh:
        fh.write(SHIM)
    sys.path.insert(0, shim_root)


def _patch_ref_pandas3(adj_mod):
    """pandas-3 compat for the unmodified reference adj_pval.

    The reference fills its output frame through ``adj_df.values[...] =``
    (seekr/adj_pval.py:87), which pandas 3's mandatory copy-on-write
    returns read-only.  The write target is still the frame's own block
    array, so flipping the writeable flag back restores the pandas<3
    semantics the reference was written for (verified: writes propagate
    to the frame).  Injected ONLY into the reference module's namespace;
    the reference source is untouched and global pandas is unaffected.
    """
    import pandas as pd

    class _AnyDataFrameMeta(type(pd.DataFrame)):
        # the reference also does ``isinstance(pvals, pd.DataFrame)``
        # (adj_pval.py:64) on plain frames from find_pval — keep that
        # check true for any pandas DataFrame
        def __instancecheck__(cls, obj):
            return isinstance(obj, pd.DataFrame)

    class _WritableValuesDF(pd.DataFrame, metaclass=_AnyDataFrameMeta):
        @property
        def values(self):  # noqa: D102 — compat shim
            arr = super().values
            try:
                arr.flags.writeable = True
            except ValueError:
                pass
            return arr

    class _PdCompat:
        DataFrame = _WritableValuesDF

        def __getattr__(self, name):
            return getattr(pd, name)

    adj_mod.pd = _PdCompat()


def run_side(side, fa, m, reps):
    if side == "ref":
        sys.path.insert(0, REFERENCE)
        import seekr.adj_pval as _ref_adj_mod
        _patch_ref_pandas3(_ref_adj_mod)
        from seekr.adj_pval import adj_pval
        from seekr.find_dist import find_dist
        from seekr.find_pval import find_pval
    else:
        from seekr_tpu.stats.adj_pval import adj_pval
        from seekr_tpu.stats.find_dist import find_dist
        from seekr_tpu.stats.find_pval import find_pval

    stages = {"find_dist": [], "find_pval": [], "adj_pval": []}
    bestfits = []
    for rep in range(reps):
        np.random.seed(0)  # both sides consume the global np.random stream

        t0 = time.perf_counter()
        fitres = find_dist(inputseq=fa, k_mer=6, log2="Log2.post",
                           models="common10", subsetting=True,
                           subset_size=100_000, fit_model=True,
                           statsmethod="ks", progress_bar=False)
        stages["find_dist"].append(time.perf_counter() - t0)
        bestfits.append(fitres[0][0])

        t0 = time.perf_counter()
        pvals = find_pval(fa, fa, "bkg_mean_6mers.npy", "bkg_std_6mers.npy",
                          6, fitres, log2="Log2.post", bestfit=1,
                          progress_bar=False)
        stages["find_pval"].append(time.perf_counter() - t0)
        assert pvals is not None and pvals.shape == (m, m)

        t0 = time.perf_counter()
        adj = adj_pval(pvals, "fdr_bh")
        stages["adj_pval"].append(time.perf_counter() - t0)
        assert adj is not None and adj.shape == (m, m)
        print(f"[{side}] rep {rep}: " + "  ".join(
            f"{k}={v[-1]:.2f}s" for k, v in stages.items()),
            file=sys.stderr, flush=True)

    med = {k: sorted(v)[len(v) // 2] for k, v in stages.items()}
    return {
        "side": side,
        "m": m,
        "reps": reps,
        "stage_median_s": {k: round(v, 3) for k, v in med.items()},
        "stage_all_s": {k: [round(x, 3) for x in v]
                        for k, v in stages.items()},
        "chain_wall_s": round(sum(med.values()), 3),
        "bestfit": bestfits[0],
        "adj_pval_multitest": ("shimmed in-house multipletests, numpy path"
                               if side == "ref" else "in-house"),
        "leiden": "excluded (igraph/leidenalg not installable here)",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "ours"], required=True)
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    workdir = args.workdir or f"/tmp/seekr_ref_chain_{args.side}_{args.m}"
    os.makedirs(workdir, exist_ok=True)
    if args.side == "ref":
        install_statsmodels_shim(workdir)
    os.environ.setdefault("MPLBACKEND", "Agg")

    fa = os.path.join(workdir, "corpus.fa")
    total_bases = write_corpus(fa, args.m)
    cwd = os.getcwd()
    os.chdir(workdir)  # both sides drop bkg_{mean,std}_6mers.npy in cwd
    try:
        out = run_side(args.side, fa, args.m, args.reps)
    finally:
        os.chdir(cwd)
        if not args.keep:
            shutil.rmtree(workdir, ignore_errors=True)
    out["total_bases"] = total_bases
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
