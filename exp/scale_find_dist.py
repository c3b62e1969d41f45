"""Scale proof: find_dist's subsetting tail at the 180k-class extreme.

SURVEY.md hard part 5 / VERDICT r2 next #2: at m=100k background
transcripts the triu pool is 5.0e9 r-values — the old materialize-then-
np.random.choice path would need a 37 GB float64 pool (on top of the 40 GB
[m, m] square pearson_blocked collected first).  The sampled path never
builds either: it draws subset_size flat triangle indices, maps them to row
pairs, and computes ONLY those correlations with a device gather-dot
(ops.pearson.pearson_pairs) — O(subset * 4^k) work.

Run:  python exp/scale_find_dist.py [m] [--cpu]
Emits one JSON line with timings and peak RSS.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    m = 100_000
    for a in sys.argv[1:]:
        if a == "--cpu":
            import jax

            jax.config.update("jax_platforms", "cpu")
        else:
            m = int(a)

    from seekr_tpu.stats.find_dist import (EXACT_SUBSAMPLE_MAX_POOL,
                                           fit_distributions,
                                           sample_triu_pairs)

    pool = m * (m - 1) // 2
    assert pool > EXACT_SUBSAMPLE_MAX_POOL, "not in the sampled regime"

    rng = np.random.default_rng(0)
    # synthetic normalized counts (the counting stage is benched separately;
    # this proves the O(m^2) -> O(subset) tail)
    counts = rng.normal(size=(m, 4096)).astype(np.float32)

    np.random.seed(0)
    t0 = time.perf_counter()
    sampled = sample_triu_pairs(counts, 100_000)
    t_sample = time.perf_counter() - t0

    t0 = time.perf_counter()
    results = fit_distributions(sampled, ["norm", "cauchy", "lognorm"],
                                statsmethod="ks")
    t_fit = time.perf_counter() - t0

    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(json.dumps({
        "m": m,
        "pool_rvalues": pool,
        "subset": int(sampled.size),
        "sample_seconds": round(t_sample, 2),
        "fit_seconds": round(t_fit, 2),
        "peak_rss_gb": round(peak_gb, 2),
        "best_fit": results[0][0],
        "old_path_pool_bytes_avoided": pool * 8 + m * m * 4,
    }))


if __name__ == "__main__":
    main()
