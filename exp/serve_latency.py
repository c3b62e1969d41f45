"""Warm-service query latency: the serving path's end-to-end number.

Measures SeekrService.query (encode -> device count+normalize ->
Pearson-vs-preloaded-standardized-targets -> fetch [Q, T] sim) against a
GENCODE-scale synthetic target set, per query-batch size.  This is the
round-3 serving story quantified: a resident process with device-resident
standardized targets and warm AOT executables, vs the one-shot CLI chain
(fresh process ~24 s cold / ~6 s warm — BASELINE.md AOT table).

Run: python exp/serve_latency.py [--targets 13000] [--queries 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 6


def synth_seqs(n, rng, l_min=512, l_max=2048):
    letters = np.array(list("AGTC"))
    return ["".join(letters[rng.integers(0, 4, rng.integers(l_min, l_max))])
            for _ in range(n)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", type=int, default=13000)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 16, 128])
    ap.add_argument("--pvals", action="store_true",
                    help="include the p-value product in the query")
    ap.add_argument("--topk", type=int, default=0,
                    help="query want=['topk'] with this size instead of "
                         "the full sim matrix (device-side selection; "
                         "only [Q, topk] crosses to the host)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    mean = rng.uniform(0.0, 2.0, 4 ** K)
    std = rng.uniform(0.5, 2.0, 4 ** K)

    from seekr_tpu.serve import SeekrService
    from seekr_tpu.stats.find_dist import fit_distributions

    fitres = None
    want = ("sim",)
    if args.pvals:
        fitres = fit_distributions(rng.normal(0.0, 0.2, 2000), ["norm"],
                                   statsmethod="ks")[:1]
        want = ("sim", "pvals")
    if args.topk:
        want = ("topk", "topk_pvals") if args.pvals else ("topk",)

    t0 = time.perf_counter()
    print(f"loading service: {args.targets} targets ...", file=sys.stderr)
    svc = SeekrService(mean=mean, std=std, k=K,
                       targets=synth_seqs(args.targets, rng), fitres=fitres)
    t_load = time.perf_counter() - t0
    t0 = time.perf_counter()
    svc.warmup()
    t_warm = time.perf_counter() - t0
    print(f"service load {t_load:.1f} s, warmup {t_warm:.1f} s")

    for q in args.batches:
        batches = [synth_seqs(q, rng) for _ in range(args.queries)]
        lat = []
        kw = dict(topk=args.topk) if args.topk else {}
        svc.query(batches[0], want=want, **kw)  # batch-shape warm
        for seqs in batches:
            t0 = time.perf_counter()
            svc.query(seqs, want=want, **kw)
            lat.append(time.perf_counter() - t0)
        lat = np.sort(lat)
        p50 = lat[len(lat) // 2] * 1e3
        p95 = lat[int(len(lat) * 0.95)] * 1e3
        # q/p50 is SEQUENCES per second (each query carries q of them);
        # queries/s is 1/p50 — don't conflate the two in reports
        print(f"  Q={q:4d}: p50 {p50:8.1f} ms  p95 {p95:8.1f} ms  "
              f"({1e3 / p50:6.1f} queries/s, "
              f"{q / lat[len(lat) // 2]:8.0f} seqs/s at p50)")


if __name__ == "__main__":
    main()
