"""int8-input variant of the production kernel: no XLA-side int32 convert.

The production kernel converts bases to int32 before pallas_call (an extra
HBM round-trip of 4 B/base).  With tm=32 the int8 block shape [32, L]
matches the (32, 128) int8 VMEM tile constraint exactly, so the kernel can
take int8 directly and widen in VMEM.  Run: python exp/kernel_i8_input.py

RESULT (2026-08-17, interleaved A/B x3 at m=8192): statistically identical
to the production int32-input kernel (2.27/2.43/2.35 ms vs 2.22/2.36/2.41)
— the conversion either overlaps with the kernel or is negligible.  NOT
shipped; kept as a recorded negative result.  (An earlier single-shot
measurement suggested a 1.6x win; that was tunnel drift — always interleave
A/B repetitions on this link.)
"""

from __future__ import annotations

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _kernel_i8(lengths_ref, bases_ref, out_ref, acc_ref, *, k, n_hi, n_lo, cw, tm):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    base0 = j * cw
    digits = bases_ref[:, pl.ds(base0, cw + k - 1)].astype(jnp.int32)
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
    hi = jnp.where(valid, code >> shift, -1)
    lo = code & (n_lo - 1)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (n_hi, cw), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (n_lo, cw), 0)
    for t in range(tm):
        h = (hi[t:t + 1, :] == iota_hi).astype(jnp.bfloat16)
        l = (lo[t:t + 1, :] == iota_lo).astype(jnp.bfloat16)
        acc_ref[t] += jax.lax.dot_general(
            h, l, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == n_chunks - 1)
    def _():
        nw = lengths_ref[...].reshape(tm, 1) - (k - 1)
        scale = jnp.where(nw > 0,
                          1000.0 / jnp.maximum(nw, 1).astype(jnp.float32), 0.0)
        out_ref[...] = acc_ref[...] * scale[:, :, None]


@functools.partial(jax.jit, static_argnames=("k",))
def count_i8(bases, lengths, k):
    m, lpad = bases.shape
    tm, cw, n_lo = 32, 2048, 128
    n_hi = 1 << (2 * k - 7)
    w = lpad - k + 1
    n_chunks = max(1, -(-w // cw))
    lpad_need = -(-(n_chunks * cw + k - 1) // 128) * 128
    m_pad = -(-m // tm) * tm
    if lpad_need != lpad or m_pad != m:
        bases = jnp.pad(bases, ((0, m_pad - m), (0, lpad_need - lpad)),
                        constant_values=4)
    if m_pad != m:
        lengths = jnp.pad(lengths, (0, m_pad - m))
    lengths = lengths.astype(jnp.int32).reshape(m_pad, 1)
    kernel = functools.partial(_kernel_i8, k=k, n_hi=n_hi, n_lo=n_lo,
                               cw=cw, tm=tm)
    out = pl.pallas_call(
        kernel, grid=(m_pad // tm, n_chunks),
        in_specs=[pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tm, lpad_need), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, n_hi, n_lo), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_hi, n_lo), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, n_hi, n_lo), jnp.float32)],
    )(lengths, bases)  # bases stays int8
    return out.reshape(m_pad, n_hi * n_lo)[:m]


if __name__ == "__main__":
    from exp.kernel_v2 import corpus, timeit, measure_floor
    from seekr_tpu.ops.count import _count_impl
    from seekr_tpu.ops.count_pallas import count_kmers_pallas

    measure_floor()
    k = 6
    b, n = corpus(32, 512, seed=1)
    want = np.asarray(_count_impl(jnp.asarray(b), jnp.asarray(n), k))
    got = np.asarray(count_i8(jnp.asarray(b), jnp.asarray(n), k))
    print("int8-input correct:", np.allclose(got, want, rtol=1e-5, atol=1e-4))

    b, n = corpus(8192, 2048, seed=0, full=True)
    bd, nd = jax.device_put(b), jax.device_put(n)
    # interleaved A/B/A/B to decorrelate tunnel drift
    for rep in range(3):
        g1, d1 = timeit(lambda x, y, kk: count_i8(x, y, kk), bd, nd, k)
        g2, d2 = timeit(lambda x, y, kk: count_kmers_pallas(x, y, kk), bd, nd, k)
        print(f"rep{rep}: int8-input {g1:.2f} Gb/s ({d1*1e3:.2f} ms) | "
              f"production-int32 {g2:.2f} Gb/s ({d2*1e3:.2f} ms)")
