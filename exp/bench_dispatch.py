"""Where does the headline bench's 2.4 ms/iter actually go?

Model: a host loop of ITERS queued dispatches costs (per_iter * ITERS +
drain); the tunneled TPU has a ~1.5 ms/dispatch round trip, so if device
time < RTT the loop is *dispatch-bound* and the headline underreports real
device throughput.  Three measurements of the SAME m=2048 workload:

  1. host loop at ITERS in {30, 100, 300}  -> fit per_iter + drain
  2. fori_loop inside ONE jit, each iteration data-dependent on the last
     via a runtime-neutral lax.select (prevents CSE/hoisting without
     changing the numbers) -> pure device time per iteration
  3. B-stacked batch: count/normalize on [B*m, L] rows (column stats over
     B identical copies == stats over one copy) + vmapped Pearson
     -> B iterations of work per dispatch

Run: python exp/bench_dispatch.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from seekr_tpu.models.pipeline import SeekrPipeline

M = 2048
L_MIN, L_MAX = 512, 2048
K = 6


def synth_corpus(seed=0):
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 4, size=(M, L_MAX), dtype=np.int8)
    lengths = rng.integers(L_MIN, L_MAX + 1, size=M, dtype=np.int32)
    mask = np.arange(L_MAX)[None, :] >= lengths[:, None]
    bases[mask] = 4
    return bases, lengths


def _sync(out):
    return np.asarray(jnp.ravel(out)[:1])


def measure_floor():
    @jax.jit
    def trivial(x):
        return x * 2.0

    x = jax.device_put(np.ones((8, 128), np.float32))
    _sync(trivial(x))
    t0 = time.perf_counter()
    for _ in range(30):
        out = trivial(x)
    _sync(out)
    return (time.perf_counter() - t0) / 30


def main():
    pipeline = SeekrPipeline(k=K, log2="Log2.post")
    fn = jax.jit(pipeline.forward)
    bases, lengths = synth_corpus()
    b = jax.device_put(bases)
    n = jax.device_put(lengths)

    floor = measure_floor()
    print(f"dispatch floor: {floor*1e3:.2f} ms")

    _sync(fn(b, n))  # compile
    for iters in (30, 100, 300):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(b, n)
            _sync(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"host loop {iters}: {best*1e3:.3f} ms/iter "
              f"({M/best:,.0f} tps)")

    # ---- in-graph fori_loop: device time per iteration ----
    def loop_fn(bases, lengths, n_iter):
        def body(i, s):
            # runtime-neutral data dependency on the carry: s is a finite
            # float at runtime, so lengths is passed through unchanged, but
            # XLA cannot prove it and must keep every iteration live.
            perturbed = jax.lax.select(
                jnp.isnan(s), lengths - 1, lengths)
            sim = pipeline.forward(bases, perturbed)
            return s + sim[0, 0]

        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    for n_iter in (16, 32):
        lf = jax.jit(loop_fn, static_argnums=2)
        _sync(lf(b, n, n_iter))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = lf(b, n, n_iter)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        per = (best - floor) / n_iter
        print(f"fori_loop {n_iter}: {per*1e3:.3f} ms/iter net of floor "
              f"({M/per:,.0f} tps)")

    # ---- B-stacked batch: B corpus passes per dispatch ----
    from seekr_tpu.ops.pearson import pearson_graph

    def batched_fn(bases_flat, lengths_flat, batch):
        normalized, _, _ = pipeline.counts(bases_flat, lengths_flat)
        stacked = normalized.reshape(batch, M, normalized.shape[1])
        return jax.vmap(pearson_graph)(stacked)

    for batch in (4, 8):
        bf = jax.jit(batched_fn, static_argnums=2)
        b_flat = jax.device_put(np.tile(bases, (batch, 1)))
        n_flat = jax.device_put(np.tile(lengths, batch))
        _sync(bf(b_flat, n_flat, batch))
        iters = 64 // batch
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = bf(b_flat, n_flat, batch)
            _sync(out)
            best = min(best, (time.perf_counter() - t0) / (iters * batch))
        print(f"stacked batch={batch}: {best*1e3:.3f} ms/corpus "
              f"({M/best:,.0f} tps)")


if __name__ == "__main__":
    main()
