"""Per-FLOP MXU efficiency e(M) of the counting kernel's dot shape.

Closes the last open number behind the k=6 tile-utilization bound
(BASELINE.md "two-row-merged dot, closed"): the bound used
e(64) <= e(128) because only e(32) (the k=6 kernel) and e(128) (k=7/8)
had been measured through the kernel.  This times the isolated dot
[M, W] @ [W, 128] (the kernel's inner contraction, bf16 operands,
f32 accumulation) for M in {32, 64, 128, 256} at the kernel's chunk
width, reporting effective TFLOP/s and % of the v5e bf16 peak.

Only the RATIO e(64) / e(32) feeds the merge bound:
net two-row-merge speedup = e(64) / (2 * e(32)).

MEASURED (v5e, 2026-08-19): a single isolated dot is dispatch-latency
bound (~150 us regardless of M — first harness attempt, useless), and
the batched form below is HBM-bound (each batch element re-reads its
[W, 128] right operand): M=32 -> 7.35 TFLOP/s, M=64 -> 11.99,
M=128 -> 21.1, M=256 -> 31.9.  In this regime the merge ratio
e(64) / (2 * e(32)) = 0.82x — a net LOSS, consistent with the
BASELINE.md analytical closure.  The kernel's VMEM-resident regime
cannot be isolated outside the kernel itself; there the bound
e(64) <= e(128) = 0.90 (measured via the k=7/8 kernels) caps the merge
at +7% before its doubled one-hot build cost.  Question closed both
ways: no two-row merge.

Run: python exp/dot_efficiency.py [--w 2048] [--g 512]
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

V5E_BF16_TFLOPS = 197.0


@jax.jit
def _batched_dot(h, l):
    """[G, M, W] @ [G, W, N] batched dot — G independent M-tall dots.

    Mirrors the kernel's work unit (one [M, W] @ [W, 128] dot per row)
    while amortizing dispatch/loop overhead over the G batch elements —
    a single isolated dot is latency-bound (~150 us on this backend)
    and measures nothing about the MXU (first harness attempt).
    """
    return jax.lax.dot_general(
        h, l, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=2048)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--g", type=int, default=512, help="dots per dispatch")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--outer", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print(f"batched dot [G={args.g}, M, {args.w}] @ [G, {args.w}, {args.n}] "
          f"bf16->f32, {args.iters} queued dispatches, best of {args.outer}")
    for m in (32, 64, 128, 256):
        h = jnp.asarray(rng.integers(0, 2, (args.g, m, args.w)), jnp.bfloat16)
        l = jnp.asarray(rng.integers(0, 2, (args.g, args.w, args.n)),
                        jnp.bfloat16)
        np.asarray(_batched_dot(h, l)[0, 0, :1])  # compile+warm
        best = float("inf")
        for _ in range(args.outer):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = _batched_dot(h, l)
            np.asarray(out[0, 0, :1])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        flops = 2 * args.g * m * args.w * args.n
        tflops = flops / best / 1e12
        print(f"  M={m:4d}: {best*1e3:8.2f} ms/batch  {tflops:7.2f} TFLOP/s "
              f"e(M) = {100 * tflops / V5E_BF16_TFLOPS:5.1f}% of bf16 peak")


if __name__ == "__main__":
    main()
