"""Pallas TPU kernel for the k-mer histogram (the framework's hot op).

Replaces the hot loop of the reference (seekr/kmer_counts.py:140-151, one
Python dict update per window) with an MXU-native accumulation that keeps
every intermediate in VMEM.

Formulation (kernel v2, round 2): the per-row histogram is the one-hot GEMM

    counts[r].reshape(n_hi, n_lo) = H_r @ L_r^T
    H_r[h, w] = (hi_code(r, w) == h)     # [n_hi, W] one-hot, bins on sublanes
    L_r[l, w] = (lo_code(r, w) == l)     # [n_lo, W] one-hot

with the window axis on *lanes* and the contraction over lanes.  Compared to
the round-1 kernel (batched [TM, W, 64] x [TM, W, 64] dots over 3D arrays
with a 64-wide minor dim), this layout
  * builds one-hots with plain 2D broadcast compares (code row [1, W]
    against a bin-index column [n_bins, 1]) — no minor-dim-64 relayouts,
  * uses an asymmetric 12-bit split (n_hi=32, n_lo=128 at k=6) so the wide
    one-hot is exactly lane-aligned,
  * feeds the MXU one clean [n_hi, W] @ [W, n_lo] contraction per row.

Measured on v5e (m=8192, L=2048, k=6, net of the tunnel's dispatch floor):
5.5 Gbases/s vs 2.35 for the XLA scan path (ops.count._count_impl) — 2.4x —
at ~90% of this formulation's MXU ceiling (the 32x128 output tile can use at
most a quarter of the 128x128 systolic array; 2*4^k = 8192 FLOP/base is
inherent to histogram-as-GEMM).  bf16 and int8 operands measure the same, so
bf16 (exact for 0/1 with f32 accumulation) is used.  Full sweep in
BASELINE.md; experiment harness in exp/kernel_v2.py.

HBM traffic is one read of the base matrix plus one write of the f32 count
matrix (~12 B/base at L=2048) — the XLA path materializes ~256 B/base of
one-hot operands, which is what bounds it.

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

# positions per inner chunk (contraction length per MXU dot)
_CW = 2048


def _row_tile(k: int) -> int:
    """Rows per grid step, sized so the f32 accumulator stays ~<=2MB VMEM.

    Swept on v5e (m=4096, L=2048): k<=6 flat above tm=32; k=7 tm=32 beats
    tm=16 by ~10% (3.22 vs 2.93 Gbases/s); k=8 is flat tm=8..16, so the
    smaller accumulator (2 MB vs 4 MB) wins.
    """
    return 32 if k <= 7 else 8


def _split_lo(k: int) -> int:
    """Low-half bit width: lane-align the wide one-hot at 128 bins."""
    return min(7, 2 * k)


def _kernel(lengths_ref, bases_ref, out_ref, acc_ref, *,
            k, n_hi, n_lo, cw, tm, scaled):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # skip chunks past every row's last window: with ragged (unbucketed)
    # inputs whole position ranges hold only padding, and the one-hot
    # builds + dots there would accumulate exact zeros
    base0 = j * cw
    tile_windows = jnp.max(lengths_ref[...]) - (k - 1)

    @pl.when(base0 < tile_windows)
    def _():
        # window codes for this chunk: positions j*cw .. j*cw+cw-1
        digits = bases_ref[:, pl.ds(base0, cw + k - 1)]  # int32 digits
        code = jnp.zeros((tm, cw), jnp.int32)
        bad = jnp.zeros((tm, cw), jnp.bool_)
        for off in range(k):
            d = digits[:, off:off + cw]  # static slice (Mosaic-lowerable)
            bad = bad | (d >= 4)
            code = code * 4 + jnp.where(d >= 4, 0, d)

        # validity: window start < len - (k-1); lengths block is [tm, 1]
        n_windows = lengths_ref[...].reshape(tm, 1) - (k - 1)
        pos = base0 + jax.lax.broadcasted_iota(jnp.int32, (tm, cw), 1)
        valid = (pos < n_windows) & ~bad

        shift = n_lo.bit_length() - 1  # n_lo is a power of two
        hi = jnp.where(valid, code >> shift, -1)  # invalid -> matches no bin
        lo = code & (n_lo - 1)

        # transposed one-hots: bins on sublanes, windows on lanes
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (n_hi, cw), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (n_lo, cw), 0)
        for t in range(tm):
            h = (hi[t:t + 1, :] == iota_hi).astype(jnp.bfloat16)  # [n_hi, cw]
            l = (lo[t:t + 1, :] == iota_lo).astype(jnp.bfloat16)  # [n_lo, cw]
            acc_ref[t] += jax.lax.dot_general(
                h, l,
                dimension_numbers=(((1,), (1,)), ((), ())),  # contract lanes
                preferred_element_type=jnp.float32,
            )

    @pl.when(j == n_chunks - 1)
    def _():
        if scaled:
            nw = lengths_ref[...].reshape(tm, 1) - (k - 1)
            scale = jnp.where(
                nw > 0, 1000.0 / jnp.maximum(nw, 1).astype(jnp.float32), 0.0)
            out_ref[...] = acc_ref[...] * scale[:, :, None]
        else:
            out_ref[...] = acc_ref[...]


def _kernel_hiblocked(lengths_ref, bases_ref, out_ref, acc_ref, *,
                      k, hb_size, n_lo, cw, tm, scaled):
    """Large-k variant: grid axis 1 tiles n_hi so the accumulator stays
    ~2 MB VMEM at k=9/10 (n_hi = 4^k/128 = 2048/8192 would need 8/32 MB
    whole).  Each (row-tile, hi-block) pair re-derives the window codes —
    O(k*cw) VPU work per step, noise next to the 2*cw*hb_size*n_lo-FLOP
    dot — and windows whose hi falls outside the block one-hot to nothing.
    """
    hb = pl.program_id(1)
    j = pl.program_id(2)
    n_chunks = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    base0 = j * cw
    tile_windows = jnp.max(lengths_ref[...]) - (k - 1)

    @pl.when(base0 < tile_windows)
    def _():
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
        hi = jnp.where(valid, code >> shift, -1)
        lo = code & (n_lo - 1)

        # bin indices of THIS hi block: hb*hb_size .. hb*hb_size+hb_size-1
        iota_hi = hb * hb_size + jax.lax.broadcasted_iota(
            jnp.int32, (hb_size, cw), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (n_lo, cw), 0)
        for t in range(tm):
            h = (hi[t:t + 1, :] == iota_hi).astype(jnp.bfloat16)
            l = (lo[t:t + 1, :] == iota_lo).astype(jnp.bfloat16)
            acc_ref[t] += jax.lax.dot_general(
                h, l,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(j == n_chunks - 1)
    def _():
        if scaled:
            nw = lengths_ref[...].reshape(tm, 1) - (k - 1)
            scale = jnp.where(
                nw > 0, 1000.0 / jnp.maximum(nw, 1).astype(jnp.float32), 0.0)
            out_ref[...] = acc_ref[...] * scale[:, :, None]
        else:
            out_ref[...] = acc_ref[...]


# hi-block width for the large-k kernel: tm=8 rows x 512 x 128 f32 = 2 MB
_HB_SIZE = 512


@functools.partial(jax.jit,
                   static_argnames=("k", "scaled", "interpret", "flat"))
def count_kmers_pallas(bases: jax.Array, lengths: jax.Array, k: int,
                       scaled: bool = True, interpret: bool = False,
                       flat: bool = True) -> jax.Array:
    """[m, Lpad] int8 digits + [m] lengths -> [m, 4^k] counts (f32).

    Same contract as ops.count._count_impl: counts/kb of windows when
    ``scaled`` (the reference's unit, kmer_counts.py:144-147), raw integer
    window counts otherwise.  m is padded to a multiple of the row tile and
    Lpad to chunk boundaries internally.

    ``flat=False`` skips the device-side [m, n_hi, n_lo] -> [m, 4^k]
    reshape and returns the 3-D tensor.  The reshape is a genuine tiled-
    layout relayout copy on TPU (profiled at 34% of the k=7 invocation,
    running at HBM roofline), but the row-major BYTES are already in flat
    order — hi*n_lo + lo IS the k-mer code — so host-side consumers get
    the identical flat matrix from a free ``np.reshape`` after the fetch.
    The trailing 3-D dims are an implementation detail (the kernel's
    hi/lo split); callers must only ever flatten them, never index them.
    Supports 2 <= k <= 10: k <= 8 runs the round-2 kernel unchanged
    (whole-histogram accumulator); k=9/10 add a grid axis tiling n_hi in
    _HB_SIZE blocks so the accumulator stays ~2 MB VMEM (VERDICT r2
    item 5).
    """
    m, lpad = bases.shape
    assert lpad >= k, "padded length must be >= k"
    assert 2 <= k <= 10, "count_kmers_pallas supports 2 <= k <= 10"
    bits = 2 * k
    sl = _split_lo(k)
    n_lo = 1 << sl
    n_hi = 1 << (bits - sl)
    tm = _row_tile(k)
    w = lpad - k + 1
    # chunk width: at most _CW, but never wider than the (lane-aligned)
    # window count — a 256-base bucket otherwise builds 2048-lane one-hots
    # and contracts 2048 lanes for ~251 real windows (8x wasted MXU work
    # and VMEM traffic on short-transcript buckets)
    cw = min(_CW, -(-w // 128) * 128)
    n_chunks = max(1, -(-w // cw))
    # lane-align the padded width to 128 (fp32/i32 tile constraint)
    lpad_need = -(-(n_chunks * cw + k - 1) // 128) * 128
    m_pad = -(-m // tm) * tm

    if lpad_need != lpad or m_pad != m:
        bases = jnp.pad(bases, ((0, m_pad - m), (0, lpad_need - lpad)),
                        constant_values=4)
    # int32 digits: int8 VMEM blocks need (32,128) tiling which conflicts
    # with the row tile; the extra HBM read (~4B/base) is negligible next to
    # the one-hot traffic this kernel eliminates
    bases = bases.astype(jnp.int32)
    if m_pad != m:
        lengths = jnp.pad(lengths, (0, m_pad - m))
    # rank-2 [m, 1] — Pallas TPU constrains rank-1 block shapes to
    # 128-multiples; a (tm, 1) block sidesteps that
    lengths = lengths.astype(jnp.int32).reshape(m_pad, 1)

    if k <= 8:
        kernel = functools.partial(_kernel, k=k, n_hi=n_hi, n_lo=n_lo, cw=cw,
                                   tm=tm, scaled=scaled)
        out = pl.pallas_call(
            kernel,
            grid=(m_pad // tm, n_chunks),
            in_specs=[
                pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, lpad_need), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, n_hi, n_lo), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, n_hi, n_lo), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tm, n_hi, n_lo), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * m_pad * n_chunks * cw * n_hi * n_lo,
                bytes_accessed=(m_pad * lpad_need * 4
                                + m_pad * n_hi * n_lo * 4),
                transcendentals=0,
            ),
            interpret=interpret,
        )(lengths, bases)
    else:
        hb_size = _HB_SIZE
        n_hb = n_hi // hb_size  # n_hi = 2^11/2^13: always divides
        kernel = functools.partial(_kernel_hiblocked, k=k, hb_size=hb_size,
                                   n_lo=n_lo, cw=cw, tm=tm, scaled=scaled)
        out = pl.pallas_call(
            kernel,
            grid=(m_pad // tm, n_hb, n_chunks),
            in_specs=[
                pl.BlockSpec((tm, 1), lambda i, hb, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, lpad_need), lambda i, hb, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, hb_size, n_lo),
                                   lambda i, hb, j: (i, hb, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, n_hi, n_lo), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tm, hb_size, n_lo), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * m_pad * n_chunks * cw * n_hi * n_lo,
                # the base matrix is re-read once per hi block
                bytes_accessed=(m_pad * lpad_need * 4 * n_hb
                                + m_pad * n_hi * n_lo * 4),
                transcendentals=0,
            ),
            interpret=interpret,
        )(lengths, bases)
    if not flat:
        return out[:m]
    return out.reshape(m_pad, n_hi * n_lo)[:m]
