"""ShardedScorer single-GEMM accounting: sim_and_topk vs sim + topk.

The scorer compiles one shard-local GEMM per entry point; a mixed
request (client wants the full sim matrix AND the top-k row) used to
pay the [Q, 4^k] x [4^k, T/D] corpus contraction twice — once per
product.  ``sim_and_topk`` folds both products into one executable.
This measures the device-side saving at GENCODE scale on a 1-device
mesh (the contraction cost per chip is the same at any D; only the
candidate merge differs, and it is negligible).

Timing per the tunnel rules: block_until_ready does not reliably block
over axon, so each call is completed by fetching a one-element slice;
many reps, median reported.

Run: python exp/scorer_gemm.py [--targets 13000] [--q 128] [--reps 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", type=int, default=13000)
    ap.add_argument("--q", type=int, default=128)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--topk", type=int, default=16)
    args = ap.parse_args()

    import jax

    from seekr_tpu.parallel.dist import ShardedScorer
    from seekr_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    n_cols = 4 ** K
    tstd = rng.normal(size=(args.targets, n_cols)).astype(np.float32)
    qc = rng.normal(size=(args.q, n_cols)).astype(np.float32)

    mesh = make_mesh(jax.devices())
    scorer = ShardedScorer(mesh, tstd)
    print(f"devices={len(jax.devices())} targets={args.targets} "
          f"Q={args.q} topk={args.topk}", flush=True)

    def timed(label, fn, probe):
        fn()  # compile
        np.asarray(probe(fn())[..., :1])
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(probe(out)[..., :1])  # force completion, tiny fetch
            ts.append(time.perf_counter() - t0)
        ts = np.asarray(ts) * 1e3
        print(f"{label:14s} p50={np.median(ts):7.2f} ms "
              f"min={ts.min():7.2f} ms", flush=True)
        return float(np.median(ts))

    t_sim = timed("sim", lambda: scorer.sim(qc), lambda o: o[0])
    t_topk = timed("topk", lambda: scorer.topk(qc, args.topk),
                   lambda o: o[0][0])
    t_both = timed("sim_and_topk", lambda: scorer.sim_and_topk(qc, args.topk),
                   lambda o: o[1][0])
    print(f"separate sim+topk = {t_sim + t_topk:.2f} ms; combined = "
          f"{t_both:.2f} ms; saving = {t_sim + t_topk - t_both:.2f} ms "
          f"({(t_sim + t_topk) / t_both:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
