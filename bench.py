"""seekr_tpu benchmark — headline throughput vs the CPU reference.

Workload: the framework's core path at the reference CLI defaults — k=6
k-mer counting + fused normalization + all-pairs Pearson — on a synthetic
GENCODE-lncRNA-like corpus (fixed seed; lengths 512..2047, ~2.6 kb mean has
been downscaled to keep the CPU baseline runnable in seconds).

Baseline: the reference implementation (pure numpy/Python, mounted at
/root/reference) timed on the SAME sequences on this host's CPU.  If the
reference is not available, a recorded baseline rate (measured on this
machine, see BASELINE.md) is used.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "transcripts/s/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Recorded on this container's CPU (reference seekr, 256-row subset of the
# exact corpus below, extrapolated): transcripts/sec for
# count(k=6)+normalize+pearson.  Used only if the reference is not mounted.
RECORDED_CPU_BASELINE_TPS = 200.0

M = 2048          # transcripts
L_MIN, L_MAX = 512, 2048
K = 6
SEED = 0
BASELINE_SUBSET = 256   # reference CPU runs this many rows, extrapolated
ITERS = 10


def synth_corpus():
    """Deterministic synthetic corpus: digits [M, L_MAX] + lengths [M]."""
    rng = np.random.default_rng(SEED)
    bases = rng.integers(0, 4, size=(M, L_MAX), dtype=np.int8)
    lengths = rng.integers(L_MIN, L_MAX + 1, size=M, dtype=np.int32)
    mask = np.arange(L_MAX)[None, :] >= lengths[:, None]
    bases[mask] = 4  # padding / invalid
    return bases, lengths


DIGIT2CHAR = np.array(list("AGTCN"))


def to_strings(bases, lengths):
    return ["".join(DIGIT2CHAR[row[:n]]) for row, n in zip(bases, lengths)]


def _sync(out):
    """Force completion of a device computation.

    block_until_ready does not reliably block on the tunneled (axon) TPU
    backend, so completion is forced by fetching a tiny slice of the result
    (the transfer cannot start before the output buffer exists).
    """
    return np.asarray(out[0, :1])


def bench_tpu(bases, lengths):
    import jax

    from seekr_tpu.models.pipeline import SeekrPipeline

    pipeline = SeekrPipeline(k=K, log2="Log2.post")
    fn = jax.jit(pipeline.forward)
    b = jax.device_put(bases)
    n = jax.device_put(lengths)
    # warmup / compile
    _sync(fn(b, n))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(b, n)
    _sync(out)
    dt = (time.perf_counter() - t0) / ITERS
    return M / dt, dt


def bench_reference_cpu(bases, lengths):
    """Time the reference on a subset of the same corpus; extrapolate.

    Counting is O(total bases) and normalization O(m * 4^k); Pearson is
    O(m^2 * 4^k).  The subset rate is extrapolated with those scalings.
    """
    if not os.path.isdir("/root/reference"):
        return None
    sys.path.insert(0, "/root/reference")
    try:
        from seekr.kmer_counts import BasicCounter as RefCounter
        from seekr.pearson import pearson as ref_pearson
    except ImportError:
        return None
    finally:
        sys.path.pop(0)

    sub = BASELINE_SUBSET
    seqs = to_strings(bases[:sub], lengths[:sub])
    t0 = time.perf_counter()
    counter = RefCounter(infasta=None, k=K, mean=True, std=True,
                         log2="Log2.post", silent=True)
    counter.seqs = seqs
    counter.get_counts()
    counts = counter.counts
    t_counts = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref_pearson(counts, counts)
    t_pearson = time.perf_counter() - t0

    scale = M / sub
    total_time_full = t_counts * scale + t_pearson * scale * scale
    return M / total_time_full


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from seekr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    bases, lengths = synth_corpus()
    tps, step_time = bench_tpu(bases, lengths)
    baseline_tps = bench_reference_cpu(bases, lengths)
    if baseline_tps is None:
        baseline_tps = RECORDED_CPU_BASELINE_TPS
    vs_baseline = (tps / baseline_tps) if baseline_tps else None
    print(json.dumps({
        "metric": "k6_count_normalize_pearson_throughput",
        "value": round(tps, 1),
        "unit": "transcripts/s/chip",
        "vs_baseline": round(vs_baseline, 1) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
