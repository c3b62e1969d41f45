"""Per-FLOP MXU efficiency e(M) of the counting kernel's dot shape.

Closes the last open number behind the k=6 tile-utilization bound
(BASELINE.md "two-row-merged dot, closed"): the bound used
e(64) <= e(128) because only e(32) (the k=6 kernel) and e(128) (k=7/8)
had been measured through the kernel.  This times the isolated dot
[M, W] @ [W, 128] (the kernel's inner contraction, bf16 operands,
f32 accumulation) for M in {32, 64, 128, 256} at the kernel's chunk
width, reporting effective TFLOP/s and % of the v5e bf16 peak.

The isolated dot overstates absolute kernel rates (no one-hot build, no
windowing) — only the RATIO e(64) / e(32) feeds the merge bound:
net two-row-merge speedup = e(64) / (2 * e(32)).

Run: python exp/dot_efficiency.py [--w 2048] [--iters 200]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

V5E_BF16_TFLOPS = 197.0


@functools.partial(jax.jit, static_argnames=("reps",))
def _dot_loop(h, l, reps: int):
    """reps sequential dots (data dependence defeats CSE) summed."""
    acc = jnp.zeros((h.shape[0], l.shape[1]), jnp.float32)

    def body(i, acc):
        # fold the carry into the left operand's first element so XLA
        # cannot hoist the dot out of the loop; the perturbation is
        # subnormal-free and does not change the dot's cost
        hh = h.at[0, 0].add(acc[0, 0].astype(jnp.bfloat16) * 0)
        return acc + jax.lax.dot_general(
            hh, l, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return jax.lax.fori_loop(0, reps, body, acc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=2048)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--outer", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print(f"dot [M, {args.w}] @ [{args.w}, {args.n}] bf16->f32, "
          f"{args.iters} in-graph reps, best of {args.outer}")
    for m in (32, 64, 128, 256):
        h = jnp.asarray(rng.integers(0, 2, (m, args.w)), jnp.bfloat16)
        l = jnp.asarray(rng.integers(0, 2, (args.w, args.n)), jnp.bfloat16)
        np.asarray(_dot_loop(h, l, args.iters)[0, :1])  # compile+warm
        best = float("inf")
        for _ in range(args.outer):
            t0 = time.perf_counter()
            out = _dot_loop(h, l, args.iters)
            np.asarray(out[0, :1])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        flops = 2 * m * args.w * args.n
        tflops = flops / best / 1e12
        print(f"  M={m:4d}: {best*1e6:8.1f} us/dot  {tflops:7.2f} TFLOP/s "
              f"e(M) = {100 * tflops / V5E_BF16_TFLOPS:5.1f}% of bf16 peak")


if __name__ == "__main__":
    main()
