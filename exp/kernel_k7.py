"""k=7 scheduling sweep for the Pallas count kernel.

Historical sweep: wall-clock A/B once read ~3.2 Gbases/s vs the 6.0
FLOP ceiling, which motivated this harness.  The round-2 xplane traces
settled it (BASELINE.md "Pure DEVICE time"): at k=7/8 the kernel runs
at ~90% of the chip's bf16 FLOP peak in pure device time — the gap was
dispatch/queue distortion plus the (since avoided) flatten relayout,
not MXU scheduling.  Kept for regression sweeps: row-tile size, chunk
width, batched-vs-loop dots, int8 operands — interleaved with the
production kernel each round so tunnel drift cannot masquerade as a
win.

Run: python exp/kernel_k7.py [--m 4096] [--l 2048]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from exp.kernel_v2 import (corpus, count_v2, measure_floor,  # noqa: E402
                           timeit)
from seekr_tpu.ops.count import _count_impl  # noqa: E402
from seekr_tpu.ops.count_pallas import count_kmers_pallas  # noqa: E402

K = 7


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--l", type=int, default=2048)
    args = ap.parse_args()

    measure_floor()
    b, n = corpus(args.m, args.l, seed=0, full=True)
    bd, nd = jax.device_put(b), jax.device_put(n)

    variants = {
        "prod(count_kmers_pallas)":
            lambda x, y, kk: count_kmers_pallas(x, y, kk),
        "xla(_count_impl)": lambda x, y, kk: _count_impl(x, y, kk),
    }
    for tm in (8, 16, 32, 64):
        variants[f"loop128x128 tm={tm}"] = (
            lambda x, y, kk, tm=tm: count_v2(
                x, y, kk, tm=tm, cw=2048, dot_dtype=jnp.bfloat16,
                batched=False, split_lo=7))
    for cw in (512, 1024):
        variants[f"loop128x128 tm=32 cw={cw}"] = (
            lambda x, y, kk, cw=cw: count_v2(
                x, y, kk, tm=32, cw=cw, dot_dtype=jnp.bfloat16,
                batched=False, split_lo=7))
    for tm in (8, 16):
        variants[f"batched128x128 tm={tm}"] = (
            lambda x, y, kk, tm=tm: count_v2(
                x, y, kk, tm=tm, cw=2048, dot_dtype=jnp.bfloat16,
                batched=True, split_lo=7))
    variants["loop128x128 tm=32 int8"] = (
        lambda x, y, kk: count_v2(x, y, kk, tm=32, cw=2048,
                                  dot_dtype=jnp.int8, batched=False,
                                  split_lo=7))
    variants["loop 64x256 tm=32"] = (
        lambda x, y, kk: count_v2(x, y, kk, tm=32, cw=2048,
                                  dot_dtype=jnp.bfloat16, batched=False,
                                  split_lo=8))

    # correctness gate vs the XLA path on a small slice
    ref = np.asarray(_count_impl(bd[:64], nd[:64], K))
    results = {}
    for name, fn in variants.items():
        try:
            got = np.asarray(fn(bd[:64], nd[:64], K))
            ok = np.allclose(got, ref, rtol=1e-5, atol=1e-3)
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        if not ok:
            print(f"  {name}: WRONG OUTPUT, skipping")
            continue
        results[name] = fn

    # 3 interleaved rounds; report the per-variant median
    print(f"\ntiming k=7 (m={args.m}, L={args.l}, net of dispatch floor),"
          " median of 3 interleaved rounds:")
    meas = {name: [] for name in results}
    for _ in range(3):
        for name, fn in results.items():
            gbs, _ = timeit(fn, bd, nd, K)
            meas[name].append(gbs)
    for name, vals in sorted(meas.items(), key=lambda kv: -np.median(kv[1])):
        print(f"  {name:28s} {np.median(vals):5.2f} Gb/s  "
              f"(runs: {', '.join(f'{v:.2f}' for v in vals)})")


if __name__ == "__main__":
    main()
