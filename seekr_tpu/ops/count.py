"""k-mer counting kernels.

Replaces the reference hot loop (seekr/kmer_counts.py:140-151: one Python
dict update per window) with an MXU-mapped histogram:

  1. k-mer window codes are built from 2-bit base digits with k shifted adds
     (``code = sum_j digit[i+j] * 4**(k-1-j)``, matching the reference's
     ``itertools.product("AGTC", k)`` column order).
  2. Each code is split into hi/lo halves (``code = hi * n_lo + lo``) and the
     per-transcript histogram is the outer product accumulation
     ``counts[r].reshape(n_hi, n_lo) = sum_w onehot(hi_w) x onehot(lo_w)``,
     i.e. a batched GEMM ``Hi^T @ Lo`` with 0/1 bfloat16 operands and fp32
     accumulation (exact integers).  This turns the scatter-add that TPUs
     hate into dense matmuls the MXU loves.
  3. Integer window counts are scaled once by ``1000 / (len - k + 1)``
     (counts per kb of windows, reference kmer_counts.py:144-147), instead of
     adding the increment per occurrence — mathematically identical and more
     accurate.

Invalid windows (containing a base outside the alphabet, e.g. N) contribute
nothing while the denominator still uses the full window count, matching
reference kmer_counts.py:148-150.

``count_kmers_host`` is the generic-alphabet host fallback (vectorized
numpy, still ~100x the reference loop) and the parity oracle for tests.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from seekr_tpu.utils.aot import aot_call

# Positions processed per accumulation step; bounds the transient one-hot
# buffers to rows * _POS_CHUNK * (n_hi + n_lo) bf16 elements.
_POS_CHUNK = 512


@functools.partial(jax.jit, static_argnames=("k", "scaled", "flat"))
def _count_impl(bases: jax.Array, lengths: jax.Array, k: int,
                scaled: bool = True, flat: bool = True) -> jax.Array:
    """bases [m, Lpad] int8 digits (>=4 invalid/pad); lengths [m] int32.

    Returns [m, 4**k] float32 counts: per-kb of windows when ``scaled``
    (the reference's unit), raw integer window counts otherwise.
    """
    m, lpad = bases.shape
    w = lpad - k + 1
    assert w >= 1, "padded length must be >= k"

    digits = bases.astype(jnp.int32)
    code = jnp.zeros((m, w), dtype=jnp.int32)
    bad = jnp.zeros((m, w), dtype=bool)
    for j in range(k):
        d = digits[:, j:j + w]
        bad = bad | (d >= 4)
        code = code * 4 + jnp.where(d >= 4, 0, d)

    n_windows = lengths - (k - 1)  # may be <= 0 for short rows
    pos = jax.lax.broadcasted_iota(jnp.int32, (m, w), 1)
    valid = (pos < n_windows[:, None]) & ~bad

    bits = 2 * k
    bl = bits // 2
    n_lo = 1 << bl
    n_hi = 1 << (bits - bl)
    hi = code >> bl
    lo = code & (n_lo - 1)

    # pad the window axis to a multiple of the chunk, then accumulate with a
    # scan so peak memory is bounded regardless of sequence length.
    chunk = min(_POS_CHUNK, w)
    n_chunks = -(-w // chunk)
    wpad = n_chunks * chunk
    if wpad != w:
        pad = ((0, 0), (0, wpad - w))
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
        valid = jnp.pad(valid, pad)

    hi = hi.reshape(m, n_chunks, chunk).transpose(1, 0, 2)
    lo = lo.reshape(m, n_chunks, chunk).transpose(1, 0, 2)
    valid = valid.reshape(m, n_chunks, chunk).transpose(1, 0, 2)

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_hi), 2)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_lo), 2)

    def step(acc, xs):
        h, l, v = xs
        h1 = ((h[:, :, None] == iota_hi) & v[:, :, None]).astype(jnp.bfloat16)
        l1 = (l[:, :, None] == iota_lo).astype(jnp.bfloat16)
        acc = acc + jnp.einsum(
            "mwi,mwj->mij", h1, l1,
            preferred_element_type=jnp.float32,
        )
        return acc, None

    acc0 = jnp.zeros((m, n_hi, n_lo), dtype=jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (hi, lo, valid))
    # flat=False skips the [m, n_hi, n_lo] -> [m, 4^k] device relayout;
    # hi*n_lo + lo is the k-mer code, so a host np.reshape of the fetched
    # bytes yields the identical flat matrix (see count_kmers_pallas)
    counts = acc if not flat else acc.reshape(m, n_hi * n_lo)
    if not scaled:
        return counts
    scale = jnp.where(n_windows > 0, 1000.0 / jnp.maximum(n_windows, 1).astype(jnp.float32), 0.0)
    return counts * scale.reshape((-1,) + (1,) * (counts.ndim - 1))


def _impl_choice(k: int) -> str:
    """Pick the counting implementation: 'pallas' or 'xla'.

    The round-2 Pallas kernel (ops.count_pallas, transposed one-hot layout)
    measures 5.5 Gbases/s on v5e vs 2.35 for the XLA scan path (m=8192,
    L=2048, k=6, net of dispatch overhead — see BASELINE.md), so it is the
    DEFAULT on TPU for the full k range it supports, [2, 10]: the k=9/10
    hi-blocked variant measured 3x the XLA scan on v5e at ~96% of the bf16
    FLOP peak (k=9: 0.359 vs 0.120 Gbases/s at m=512; k=10: 0.091 vs
    0.032 at m=128; exp/kernel_k9_k10.py, round 3).  The XLA path remains
    the default off-TPU (the kernel would run interpreted) and for k > 10.
    Override with SEEKR_TPU_COUNT_IMPL={pallas,xla}.
    """
    forced = os.environ.get("SEEKR_TPU_COUNT_IMPL", "").lower()
    if forced == "xla":
        return "xla"
    if forced == "pallas":
        # the kernel itself only supports 2 <= k <= 10; outside that range
        # honor the spirit of the override as far as possible, not crash
        return "pallas" if 2 <= k <= 10 else "xla"
    if jax.default_backend() == "tpu" and 2 <= k <= 10:
        return "pallas"
    return "xla"


def count_graph(bases: jax.Array, lengths: jax.Array, k: int,
                scaled: bool = True, flat: bool = True) -> jax.Array:
    """Jit-composable k-mer count: dispatches to the best single-device impl.

    ``flat=False`` returns the un-flattened [m, n_hi, n_lo] accumulator
    (implementation-defined split; row-major bytes ARE the flat counts) —
    for host-facing callers that fetch the result anyway, skipping the
    device-side relayout copy of the flatten (profiled at 10-34% of the
    call depending on k; see count_kmers_pallas).

    Note: inside GSPMD-sharded jits (seekr_tpu.parallel.dist) the XLA path
    is used directly — XLA can partition the einsum across the mesh, while a
    pallas_call is an opaque unit to the partitioner.
    """
    if _impl_choice(k) == "pallas":
        from seekr_tpu.ops.count_pallas import _row_tile, count_kmers_pallas

        # tiny batches (e.g. the 2-8 chunk rows of count_kmers_long) would
        # be padded up to a full row tile of all-invalid MXU work — the XLA
        # path sizes to the actual rows and wins there
        forced = os.environ.get("SEEKR_TPU_COUNT_IMPL", "").lower()
        if bases.shape[0] >= _row_tile(k) or forced == "pallas":
            # non-TPU backends only support the kernel in interpreter mode
            interpret = jax.default_backend() != "tpu"
            return aot_call(count_kmers_pallas, (bases, lengths),
                            dict(k=k, scaled=scaled, interpret=interpret,
                                 flat=flat))
    return aot_call(_count_impl, (bases, lengths),
                    dict(k=k, scaled=scaled, flat=flat))


def count_kmers_device(bases, lengths, k: int, flat: bool = True) -> jax.Array:
    """Count k-mers for padded 2-bit encoded sequences on the default device."""
    return count_graph(jnp.asarray(bases), jnp.asarray(lengths), k, flat=flat)


def split_long_digits(digits: np.ndarray, k: int, n_chunks: int):
    """Split one digit sequence into overlapping chunks for parallel count.

    Chunks tile the window-start positions with a (k-1)-base halo so every
    window is counted exactly once; tail padding is INVALID (4) so phantom
    windows contribute nothing.  Returns ([n_chunks, chunk + k - 1] int8,
    n_windows).
    """
    L = digits.shape[0]
    n_windows = L - k + 1
    # chunk >= 1 keeps the kernel's window width >= 1 even for an empty
    # digit vector (all-INVALID chunks count nothing; callers scale by
    # n_windows <= 0 -> zeros)
    chunk = max(1, -(-L // n_chunks))
    padded = np.full(chunk * n_chunks + k - 1, 4, dtype=np.int8)
    padded[:L] = digits
    chunks = np.stack([padded[i * chunk: i * chunk + chunk + k - 1]
                       for i in range(n_chunks)])
    return chunks, n_windows


def count_kmers_long(digits: np.ndarray, k: int,
                     target_chunk: int = 8192) -> np.ndarray:
    """Histogram of ONE very long sequence via chunked device counting.

    Sequence-parallel decomposition on a single device: instead of padding a
    90kb transcript to a 131k-column bucket, count ~``target_chunk``-sized
    chunks as rows (halo of k-1 bases) and sum the partial histograms —
    bounded compile shapes and no padding waste.  Same result as counting
    the sequence whole.
    """
    L = digits.shape[0]
    if L - k + 1 < 1:
        return np.zeros((1 << (2 * k),), dtype=np.float32)
    n_chunks = max(1, -(-L // target_chunk))
    # power-of-two chunk-count buckets keep compiled shapes bounded
    rows = 1
    while rows < n_chunks:
        rows *= 2
    chunks, n_windows = split_long_digits(digits, k, rows)
    lengths = np.full(rows, chunks.shape[1], dtype=np.int32)
    partial = count_graph(jnp.asarray(chunks), jnp.asarray(lengths), k,
                          scaled=False)
    total = jnp.sum(partial, axis=0)
    return np.asarray(total * (1000.0 / n_windows), dtype=np.float32)


def count_kmers_host(seqs: Sequence[str], k: int, alphabet: str = "AGTC") -> np.ndarray:
    """Vectorized numpy counter for arbitrary alphabets (parity oracle).

    Matches reference semantics exactly: every window over the sequence is in
    the denominator; only windows made purely of alphabet letters count.
    """
    a = len(alphabet)
    n_cols = a ** k
    lut = np.full(256, -1, dtype=np.int64)
    # uppercase only: the reference's k-mer map has uppercase keys, so
    # lowercase (soft-masked) windows are skipped with the denominator kept
    for digit, ch in enumerate(alphabet):
        lut[ord(ch)] = digit
    out = np.zeros((len(seqs), n_cols), dtype=np.float32)
    powers = a ** np.arange(k - 1, -1, -1, dtype=np.int64)
    for i, seq in enumerate(seqs):
        n = len(seq)
        w = n - k + 1
        if w < 1:
            continue
        digits = lut[np.frombuffer(seq.encode("ascii", errors="replace"), dtype=np.uint8)]
        windows = np.lib.stride_tricks.sliding_window_view(digits, k)
        valid = (windows >= 0).all(axis=1)
        codes = (windows * powers).sum(axis=1)[valid]
        row = np.zeros(n_cols, dtype=np.int64)
        np.add.at(row, codes, 1)
        out[i] = row.astype(np.float64) * (1000.0 / w)
    return out
