"""Counting-kernel v2 experiments (round 2).

Round-1 facts (BASELINE.md): XLA scan one-hot einsum = 2.3 Gbases/s
(HBM-bound, ~256 B/base of materialized one-hots); Pallas v1 = 0.66 Gbases/s
(batch-8 64x64 dots on 3D minor-dim-64 one-hots -> bad Mosaic layouts).

v2 hypothesis: keep everything in VMEM but build the one-hots TRANSPOSED
(bins on sublanes, window positions on lanes) with pure 2D broadcast
compares, and contract over the lane axis.  Variants:

  A  loop-TM rows, 32x128 split, bf16 one-hots, f32 accum
  B  batched dot_general (batch=TM) instead of the python loop
  C  int8 one-hots, int32 accum (2x MXU rate on v5e if lowered natively)
  E  64x64 split with the shared 3-mer one-hot (H and L are shifted slices
     of ONE one-hot -> half the VPU compare work)

NOTE: variant A (the winner) shipped as seekr_tpu/ops/count_pallas.py with
tm=32.  The local count_v2 here is a frozen sweep copy (tm/split/dtype
parameterized) and may diverge from production fixes — the timing run
therefore also benchmarks the PRODUCTION kernel directly; compare new sweep
numbers against that row, not against A_loop.

Run:  python exp/kernel_v2.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seekr_tpu.ops.count import _count_impl


def _sync(out):
    return np.asarray(out[0, :1])


# ---------------------------------------------------------------- variant A/B/C

def _kernel_v2(lengths_ref, bases_ref, out_ref, acc_ref, *,
               k, n_hi, n_lo, cw, tm, dot_dtype, batched):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    base0 = j * cw
    digits = bases_ref[:, pl.ds(base0, cw + k - 1)]
    code = jnp.zeros((tm, cw), jnp.int32)
    bad = jnp.zeros((tm, cw), jnp.bool_)
    for off in range(k):
        d = digits[:, off:off + cw]
        bad = bad | (d >= 4)
        code = code * 4 + jnp.where(d >= 4, 0, d)

    n_windows = lengths_ref[...].reshape(tm, 1) - (k - 1)
    pos = base0 + jax.lax.broadcasted_iota(jnp.int32, (tm, cw), 1)
    valid = (pos < n_windows) & ~bad

    shift = n_lo.bit_length() - 1
    hi = jnp.where(valid, code >> shift, -1)   # invalid -> matches no bin
    lo = code & (n_lo - 1)

    acc_dtype = acc_ref.dtype
    if batched:
        # one-hots as [tm, n_bins, cw]: minor dim cw is 128-aligned
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (tm, n_hi, cw), 1)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (tm, n_lo, cw), 1)
        h = (hi[:, None, :] == iota_hi).astype(dot_dtype)
        l = (lo[:, None, :] == iota_lo).astype(dot_dtype)
        acc_ref[...] += jax.lax.dot_general(
            h, l, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=acc_dtype)
    else:
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (n_hi, cw), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (n_lo, cw), 0)
        for t in range(tm):
            h = (hi[t:t + 1, :] == iota_hi).astype(dot_dtype)   # [n_hi, cw]
            l = (lo[t:t + 1, :] == iota_lo).astype(dot_dtype)   # [n_lo, cw]
            acc_ref[t] += jax.lax.dot_general(
                h, l, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc_dtype)

    @pl.when(j == n_chunks - 1)
    def _():
        nw = lengths_ref[...].reshape(tm, 1) - (k - 1)
        scale = jnp.where(nw > 0,
                          1000.0 / jnp.maximum(nw, 1).astype(jnp.float32), 0.0)
        out_ref[...] = acc_ref[...].astype(jnp.float32) * scale[:, :, None]


@functools.partial(jax.jit, static_argnames=("k", "tm", "cw", "dot_dtype",
                                             "batched", "split_lo"))
def count_v2(bases, lengths, k, tm=8, cw=2048, dot_dtype=jnp.bfloat16,
             batched=False, split_lo=7):
    m, lpad = bases.shape
    bits = 2 * k
    n_lo = 1 << split_lo
    n_hi = 1 << (bits - split_lo)

    w = lpad - k + 1
    n_chunks = max(1, -(-w // cw))
    lpad_need = -(-(n_chunks * cw + k - 1) // 128) * 128
    m_pad = -(-m // tm) * tm
    if lpad_need != lpad or m_pad != m:
        bases = jnp.pad(bases, ((0, m_pad - m), (0, lpad_need - lpad)),
                        constant_values=4)
    bases = bases.astype(jnp.int32)
    if m_pad != m:
        lengths = jnp.pad(lengths, (0, m_pad - m))
    lengths = lengths.astype(jnp.int32).reshape(m_pad, 1)

    acc_dtype = jnp.int32 if dot_dtype == jnp.int8 else jnp.float32
    kernel = functools.partial(_kernel_v2, k=k, n_hi=n_hi, n_lo=n_lo, cw=cw,
                               tm=tm, dot_dtype=dot_dtype, batched=batched)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // tm, n_chunks),
        in_specs=[
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, lpad_need), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, n_hi, n_lo), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_hi, n_lo), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, n_hi, n_lo), acc_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_chunks * cw * n_hi * n_lo,
            bytes_accessed=m_pad * lpad_need * 4 + m_pad * (1 << bits) * 4,
            transcendentals=0),
    )(lengths, bases)
    return out.reshape(m_pad, n_hi * n_lo)[:m]


# ---------------------------------------------------------------- variant E

def _kernel_e(lengths_ref, bases_ref, out_ref, acc_ref, *, k, cw, tm, dot_dtype):
    """64x64 split where H and L are shifted slices of ONE 3-mer one-hot."""
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    half = k // 2              # k must be even; n_hi = n_lo = 4**half
    nb = 1 << k                # 2**k = 4**half bins per half

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    base0 = j * cw
    span = cw + k - 1          # positions covering both half-mer windows
    digits = bases_ref[:, pl.ds(base0, span)]
    # 3-mer (half-mer) code at every position p: digits p..p+half-1
    tw = span - half + 1
    tri = jnp.zeros((tm, tw), jnp.int32)
    tbad = jnp.zeros((tm, tw), jnp.bool_)
    for off in range(half):
        d = digits[:, off:off + tw]
        tbad = tbad | (d >= 4)
        tri = tri * 4 + jnp.where(d >= 4, 0, d)
    tri = jnp.where(tbad, -1, tri)

    n_windows = lengths_ref[...].reshape(tm, 1) - (k - 1)
    pos = base0 + jax.lax.broadcasted_iota(jnp.int32, (tm, cw), 1)
    invalid = pos >= n_windows

    iota = jax.lax.broadcasted_iota(jnp.int32, (nb, cw), 0)
    acc_dtype = acc_ref.dtype
    for t in range(tm):
        hi_code = jnp.where(invalid[t:t + 1, :], -1, tri[t:t + 1, 0:cw])
        h = (hi_code == iota).astype(dot_dtype)                  # [nb, cw]
        l = (tri[t:t + 1, half:half + cw] == iota).astype(dot_dtype)
        acc_ref[t] += jax.lax.dot_general(
            h, l, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype)

    @pl.when(j == n_chunks - 1)
    def _():
        nw = lengths_ref[...].reshape(tm, 1) - (k - 1)
        scale = jnp.where(nw > 0,
                          1000.0 / jnp.maximum(nw, 1).astype(jnp.float32), 0.0)
        out_ref[...] = acc_ref[...].astype(jnp.float32) * scale[:, :, None]


@functools.partial(jax.jit, static_argnames=("k", "tm", "cw", "dot_dtype"))
def count_e(bases, lengths, k, tm=8, cw=2048, dot_dtype=jnp.bfloat16):
    assert k % 2 == 0
    m, lpad = bases.shape
    nb = 1 << k
    w = lpad - k + 1
    n_chunks = max(1, -(-w // cw))
    lpad_need = -(-(n_chunks * cw + k - 1) // 128) * 128
    m_pad = -(-m // tm) * tm
    if lpad_need != lpad or m_pad != m:
        bases = jnp.pad(bases, ((0, m_pad - m), (0, lpad_need - lpad)),
                        constant_values=4)
    bases = bases.astype(jnp.int32)
    if m_pad != m:
        lengths = jnp.pad(lengths, (0, m_pad - m))
    lengths = lengths.astype(jnp.int32).reshape(m_pad, 1)

    acc_dtype = jnp.int32 if dot_dtype == jnp.int8 else jnp.float32
    kernel = functools.partial(_kernel_e, k=k, cw=cw, tm=tm, dot_dtype=dot_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // tm, n_chunks),
        in_specs=[
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, lpad_need), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, nb, nb), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, nb, nb), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, nb, nb), acc_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_chunks * cw * nb * nb,
            bytes_accessed=m_pad * lpad_need * 4 + m_pad * nb * nb * 4,
            transcendentals=0),
    )(lengths, bases)
    return out.reshape(m_pad, nb * nb)[:m]


# ---------------------------------------------------------------- harness

def corpus(m, l_max, seed=0, full=False):
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 4, size=(m, l_max), dtype=np.int8)
    if full:
        lengths = np.full(m, l_max, dtype=np.int32)
    else:
        lengths = rng.integers(l_max // 4, l_max + 1, size=m, dtype=np.int32)
    mask = np.arange(l_max)[None, :] >= lengths[:, None]
    bases[mask] = 4
    # sprinkle some invalid bases inside valid regions
    inv = rng.random((m, l_max)) < 0.001
    bases[inv & ~mask] = 4
    return bases, lengths


def check(fn, name, k=6):
    b, n = corpus(32, 512, seed=1)
    want = np.asarray(_count_impl(jnp.asarray(b), jnp.asarray(n), k))
    try:
        got = np.asarray(fn(jnp.asarray(b), jnp.asarray(n), k))
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: FAILED to run: {type(e).__name__}: {str(e)[:300]}")
        return False
    ok = np.allclose(got, want, rtol=1e-5, atol=1e-4)
    if not ok:
        bad = np.abs(got - want)
        print(f"  {name}: WRONG  maxerr={bad.max()} at {np.unravel_index(bad.argmax(), bad.shape)}")
        return False
    print(f"  {name}: correct")
    return True


DISPATCH_FLOOR_S = 0.0  # measured at startup


def measure_floor():
    global DISPATCH_FLOOR_S

    @jax.jit
    def trivial(x):
        return x * 2.0

    x = jax.device_put(np.ones((8, 128), np.float32))
    _sync(trivial(x))
    t0 = time.perf_counter()
    for _ in range(20):
        out = trivial(x)
    _sync(out)
    DISPATCH_FLOOR_S = (time.perf_counter() - t0) / 20
    print(f"dispatch floor: {DISPATCH_FLOOR_S*1e3:.2f} ms/iter")


def timeit(fn, b, n, k, iters=10):
    out = fn(b, n, k)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(b, n, k)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    dt_net = max(dt - DISPATCH_FLOOR_S, 1e-9)
    total_bases = int(np.asarray(n).sum())
    return total_bases / dt_net / 1e9, dt_net


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--m", type=int, default=8192)
    ap.add_argument("--l", type=int, default=2048)
    args = ap.parse_args()
    k = 6

    variants = {
        "A_loop_32x128_bf16": lambda b, n, kk: count_v2(b, n, kk, batched=False, dot_dtype=jnp.bfloat16, split_lo=7),
        "A_loop_64x64_bf16": lambda b, n, kk: count_v2(b, n, kk, batched=False, dot_dtype=jnp.bfloat16, split_lo=6),
        "B_batched_32x128_bf16": lambda b, n, kk: count_v2(b, n, kk, batched=True, dot_dtype=jnp.bfloat16, split_lo=7),
        "C_loop_32x128_int8": lambda b, n, kk: count_v2(b, n, kk, batched=False, dot_dtype=jnp.int8, split_lo=7),
        "C_loop_64x64_int8": lambda b, n, kk: count_v2(b, n, kk, batched=False, dot_dtype=jnp.int8, split_lo=6),
        "E_shared3mer_64x64_bf16": lambda b, n, kk: count_e(b, n, kk, dot_dtype=jnp.bfloat16),
        "E_shared3mer_64x64_int8": lambda b, n, kk: count_e(b, n, kk, dot_dtype=jnp.int8),
    }

    print("correctness (32x512, k=6, vs _count_impl):")
    good = {}
    for name, fn in variants.items():
        if check(fn, name, k):
            good[name] = fn

    if args.quick:
        return

    measure_floor()
    print(f"\ntiming (m={args.m}, L={args.l} full-length, k=6, net of floor):")
    b, n = corpus(args.m, args.l, seed=0, full=True)
    bd, nd = jax.device_put(b), jax.device_put(n)

    gbs, dt = timeit(lambda x, y, kk: _count_impl(x, y, kk), bd, nd, k)
    print(f"  XLA _count_impl (baseline): {gbs:.2f} Gbases/s  ({dt*1e3:.2f} ms)")

    from seekr_tpu.ops.count_pallas import count_kmers_pallas
    gbs, dt = timeit(lambda x, y, kk: count_kmers_pallas(x, y, kk), bd, nd, k)
    print(f"  PRODUCTION count_kmers_pallas: {gbs:.2f} Gbases/s  ({dt*1e3:.2f} ms)")

    for name, fn in good.items():
        try:
            gbs, dt = timeit(fn, bd, nd, k)
            print(f"  {name}: {gbs:.2f} Gbases/s  ({dt*1e3:.2f} ms)")
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: timing failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
