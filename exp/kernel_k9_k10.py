"""k=9/10 single-chip measurement: hi-blocked Pallas kernel vs XLA scan.

VERDICT r2 item 5: the Pallas kernel previously stopped at k=8 and k=9/10
silently fell to the XLA path with no recorded numbers.  Round 3 added the
hi-blocked kernel variant (ops/count_pallas._kernel_hiblocked, n_hi tiled
over a third grid axis); this harness measures both implementations
interleaved (tunnel drift cannot masquerade as a win — see
exp/kernel_k7.py) at the largest m that fits HBM comfortably, flat=False
on both sides so the flatten relayout does not distort the comparison.

Roofline context: histogram-as-GEMM costs 2*4^k FLOP/base, so the bf16
ceiling is ~375 Mbases/s at k=9 and ~94 at k=10; the raw f32 output write
alone is 1 MB/row (k=9) / 4 MB (k=10), i.e. the HBM write bound at
L=2048 is ~1.7 / 0.42 Gbases/s.  Whichever side wins, the number goes in
BASELINE.md and the dispatch default in ops/count._impl_choice follows it.

Run: python exp/kernel_k9_k10.py [--m9 512] [--m10 128] [--l 2048]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from exp.kernel_v2 import corpus, measure_floor, timeit  # noqa: E402
from seekr_tpu.ops.count import _count_impl  # noqa: E402
from seekr_tpu.ops.count_pallas import count_kmers_pallas  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m9", type=int, default=512)
    ap.add_argument("--m10", type=int, default=128)
    ap.add_argument("--l", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    measure_floor()

    variants = {
        "pallas(hi-blocked)": lambda x, y, kk: count_kmers_pallas(
            x, y, kk, flat=False),
        "xla(_count_impl)": lambda x, y, kk: _count_impl(
            x, y, kk, flat=False),
    }

    for k, m in ((9, args.m9), (10, args.m10)):
        b, n = corpus(m, args.l, seed=0, full=True)
        bd, nd = jax.device_put(b), jax.device_put(n)
        out_gb = m * (4 ** k) * 4 / 2**30
        print(f"\n== k={k} m={m} L={args.l} (counts output {out_gb:.1f} "
              f"GiB) ==")

        # correctness cross-check once per k before timing; compare FLAT —
        # the two impls pick different (n_hi, n_lo) splits at odd k (e.g.
        # 2048x128 vs 512x512 at k=9) but the row-major bytes are the same
        # flat counts by construction
        small_b, small_n = corpus(16, 256, seed=1)
        want = np.asarray(_count_impl(jnp.asarray(small_b),
                                      jnp.asarray(small_n), k, flat=False))
        got = np.asarray(count_kmers_pallas(jnp.asarray(small_b),
                                            jnp.asarray(small_n), k,
                                            flat=False))
        np.testing.assert_allclose(got.reshape(got.shape[0], -1),
                                   want.reshape(want.shape[0], -1),
                                   rtol=1e-5, atol=1e-5)
        print("   parity ok (pallas == xla at m=16, L=256)")

        best = {name: 0.0 for name in variants}
        for rep in range(args.reps):  # interleaved A/B
            for name, fn in variants.items():
                gbps, dt = timeit(fn, bd, nd, k, iters=args.iters)
                best[name] = max(best[name], gbps)
                print(f"   rep{rep} {name:22s} {gbps:7.3f} Gbases/s "
                      f"({dt*1e3:.1f} ms)")
        for name, gbps in best.items():
            flops = 2 * (4 ** k) * gbps * 1e9
            print(f"   BEST {name:22s} {gbps:7.3f} Gbases/s = "
                  f"{flops/1e12:.1f} TFLOP/s effective")


if __name__ == "__main__":
    main()
