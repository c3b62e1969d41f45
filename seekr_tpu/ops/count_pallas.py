"""Pallas TPU kernel for the k-mer histogram (the framework's hot op).

Replaces the hot loop of the reference (seekr/kmer_counts.py:140-151, one
Python dict update per window) with an MXU-native accumulation, fusing in
one kernel what the XLA scan path (seekr_tpu.ops.count._count_impl) spreads
over producer/consumer boundaries:

  per (row-tile, position-chunk) grid step, entirely in VMEM:
    1. rolling window codes from 2-bit digits (k shifted adds, VPU)
    2. hi/lo one-hot expansion (broadcasted-iota compare, bf16)
    3. batched 64x64 (4^k = 64*64 at k=6) outer-product accumulation
       hi^T @ lo on the MXU, f32 accumulator in scratch
    4. on the last chunk: scale by 1000/(len-k+1) and write the
       [TM, 4^k] tile to HBM

HBM traffic is therefore one read of the base matrix plus one write of the
f32 count matrix — the XLA path re-materializes the one-hot operands in HBM
whenever a bucket's [rows, chunk, 4^(k/2)] operand exceeds VMEM.

Measured (v5e, m=2048, L=2048, k=6): this kernel sustains ~0.66 Gbases/s vs
~2.28 for the XLA scan path — the batch-8 64x64 MXU dots reach only ~5%
MXU utilization, while XLA's one big fused einsum rides the HBM roofline.
The kernel is kept as an opt-in implementation (SEEKR_TPU_COUNT_IMPL=pallas)
and a baseline for future Mosaic scheduling work; the dispatch default is
the XLA path (see ops.count._use_pallas).

Windows containing invalid digits (N etc., digit >= 4) are masked out of the
hi one-hot while the denominator keeps the full window count, matching
reference kmer_counts.py:144-150.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid tile; one-hot VMEM scales linearly with this
_TM = 8


def _chunk_width(k: int) -> int:
    """Positions per inner chunk, sized so one-hots fit comfortably in VMEM."""
    bits = 2 * k
    n_hi = 1 << (bits - bits // 2)
    # 2 one-hot buffers of [TM, CW, n_hi] bf16 <= ~4MB
    budget = 4 * 1024 * 1024
    cw = budget // (2 * _TM * n_hi * 2)
    return max(256, min(2048, (cw // 256) * 256))


def _kernel(lengths_ref, bases_ref, out_ref, acc_ref, *, k, n_hi, n_lo, cw):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # window codes for this chunk: positions j*cw .. j*cw+cw-1
    base0 = j * cw
    digits = bases_ref[:, pl.ds(base0, cw + k - 1)]  # int32 digits
    tm = digits.shape[0]
    code = jnp.zeros((tm, cw), jnp.int32)
    bad = jnp.zeros((tm, cw), jnp.bool_)
    for off in range(k):
        d = digits[:, off:off + cw]  # static slice (Mosaic-lowerable)
        bad = bad | (d >= 4)
        code = code * 4 + jnp.where(d >= 4, 0, d)

    # validity: window start must be < len - (k-1); lengths block is [tm, 1]
    n_windows = lengths_ref[...].reshape(tm, 1) - (k - 1)
    pos = base0 + jax.lax.broadcasted_iota(jnp.int32, (tm, cw), 1)
    valid = (pos < n_windows) & ~bad

    shift = n_lo.bit_length() - 1  # n_lo is a power of two
    # fold the validity mask into hi (invalid -> -1, matches no iota lane):
    # Mosaic only supports minor-dim insertion on 32-bit types, so only the
    # int32 codes are expanded to 3D, never a bool mask
    hi = jnp.where(valid, code >> shift, -1)
    lo = code & (n_lo - 1)

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (tm, cw, n_hi), 2)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (tm, cw, n_lo), 2)
    h1 = (hi[:, :, None] == iota_hi).astype(jnp.bfloat16)
    l1 = (lo[:, :, None] == iota_lo).astype(jnp.bfloat16)

    acc_ref[...] += jax.lax.dot_general(
        h1, l1,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),  # [tm, n_hi, n_lo]
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_chunks - 1)
    def _():
        # output stays 3D [tm, n_hi, n_lo]: Mosaic cannot shape-cast
        # 3D->2D in-kernel; the caller reshapes for free in XLA
        nw = lengths_ref[...].reshape(tm, 1) - (k - 1)
        scale = jnp.where(nw > 0, 1000.0 / jnp.maximum(nw, 1).astype(jnp.float32), 0.0)
        out_ref[...] = acc_ref[...] * scale[:, :, None]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def count_kmers_pallas(bases: jax.Array, lengths: jax.Array, k: int,
                       interpret: bool = False) -> jax.Array:
    """[m, Lpad] int8 digits + [m] lengths -> [m, 4^k] counts/kb (f32).

    Same contract as ops.count._count_impl(scaled=True).  m is padded to a
    multiple of the row tile and Lpad to chunk boundaries internally.
    """
    m, lpad = bases.shape
    assert lpad >= k, "padded length must be >= k"
    bits = 2 * k
    n_lo = 1 << (bits // 2)
    n_hi = 1 << (bits - bits // 2)
    cw = _chunk_width(k)

    w = lpad - k + 1
    n_chunks = max(1, -(-w // cw))
    # lane-align the padded width to 128 (fp32/i32 tile constraint)
    lpad_need = -(-(n_chunks * cw + k - 1) // 128) * 128
    m_pad = -(-m // _TM) * _TM

    if lpad_need != lpad or m_pad != m:
        bases = jnp.pad(bases, ((0, m_pad - m), (0, lpad_need - lpad)),
                        constant_values=4)
    # int32 digits: int8 VMEM blocks need (32,128) tiling which conflicts
    # with the small row tile; the extra HBM read (~4B/base) is negligible
    # next to the one-hot traffic this kernel eliminates
    bases = bases.astype(jnp.int32)
    if m_pad != m:
        lengths = jnp.pad(lengths, (0, m_pad - m))
    # rank-2 [m, 1] — Pallas TPU constrains rank-1 block shapes to
    # 128-multiples; a (TM, 1) block sidesteps that
    lengths = lengths.astype(jnp.int32).reshape(m_pad, 1)

    kernel = functools.partial(_kernel, k=k, n_hi=n_hi, n_lo=n_lo, cw=cw)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // _TM, n_chunks),
        in_specs=[
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, lpad_need), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TM, n_hi, n_lo), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_hi, n_lo), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_TM, n_hi, n_lo), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_chunks * cw * (n_hi + n_lo),
            bytes_accessed=m_pad * lpad_need * 4 + m_pad * n_hi * n_lo * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lengths, bases)
    return out.reshape(m_pad, n_hi * n_lo)[:m]
