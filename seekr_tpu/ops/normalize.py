"""Fused normalization epilogue for count matrices.

Reproduces the exact reference pipeline order (seekr/kmer_counts.py:194-209):

    raw counts-per-kb
    -> (Log2.pre)  counts = log2(counts + 1)                (:189-192, :201-202)
    -> center      counts -= mean  (column mean if computed) (:165-169)
    -> standardize counts /= std   (column population std of the
                                    ALREADY-CENTERED matrix) (:171-175)
    -> (Log2.post) counts += |global min|; counts = log2(counts + 1)  (:207-209)

Everything runs in float32 under one jit so XLA fuses the elementwise chain
into a single HBM pass.  Returns the (possibly computed) mean/std so callers
can persist norm vectors (reference console_scripts.py:659-663).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from seekr_tpu.ops.math import accurate_log2
from seekr_tpu.utils.aot import aot_call

LOG2_PRE = "Log2.pre"
LOG2_POST = "Log2.post"
LOG2_NONE = "Log2.none"


@functools.partial(
    jax.jit,
    static_argnames=("log2_mode", "use_mean", "use_std", "compute_mean", "compute_std"),
)
def _normalize_impl(counts, mean_arr, std_arr, *, log2_mode, use_mean, use_std,
                    compute_mean, compute_std):
    counts = counts.astype(jnp.float32)
    if log2_mode == LOG2_PRE:
        counts = accurate_log2(counts + 1.0)

    mean = None
    if use_mean:
        mean = jnp.mean(counts, axis=0) if compute_mean else mean_arr.astype(jnp.float32)
        counts = counts - mean

    std = None
    if use_std:
        std = jnp.std(counts, axis=0) if compute_std else std_arr.astype(jnp.float32)
        counts = counts / std

    if log2_mode == LOG2_POST:
        counts = counts + jnp.abs(jnp.min(counts))
        counts = accurate_log2(counts + 1.0)

    zero = jnp.zeros((counts.shape[1],), jnp.float32)
    return counts, (mean if mean is not None else zero), (std if std is not None else zero)


def normalize_counts(
    counts,
    *,
    log2_mode: str = LOG2_POST,
    mean=True,
    std=True,
) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    """Normalize a raw count matrix.

    ``mean``/``std`` follow the reference contract: ``True`` computes the
    column statistic from the data, ``False`` skips the step, an array uses
    the provided vector.

    Returns (normalized_counts, mean_or_None, std_or_None).
    """
    if log2_mode not in (LOG2_PRE, LOG2_POST, LOG2_NONE):
        raise ValueError("log2 must be one of ['Log2.pre', 'Log2.post', 'Log2.none']")

    n_cols = counts.shape[1]
    use_mean = mean is not False
    use_std = std is not False
    compute_mean = mean is True
    compute_std = std is True
    dummy = jnp.zeros((n_cols,), jnp.float32)
    mean_arr = dummy if (not use_mean or compute_mean) else jnp.asarray(mean)
    std_arr = dummy if (not use_std or compute_std) else jnp.asarray(std)

    out, mean_out, std_out = aot_call(
        _normalize_impl, (jnp.asarray(counts), mean_arr, std_arr),
        dict(log2_mode=log2_mode, use_mean=use_mean, use_std=use_std,
             compute_mean=compute_mean, compute_std=compute_std),
    )
    return out, (mean_out if use_mean else None), (std_out if use_std else None)


@functools.partial(jax.jit, static_argnames=("log2_mode", "n_segments"))
def _normalize_segmented_impl(counts, mean_arr, std_arr, seg_ids, *,
                              log2_mode, n_segments):
    counts = counts.astype(jnp.float32)
    if log2_mode == LOG2_PRE:
        counts = accurate_log2(counts + 1.0)
    counts = counts - mean_arr.astype(jnp.float32)
    counts = counts / std_arr.astype(jnp.float32)
    if log2_mode == LOG2_POST:
        # per-SEGMENT |min| shift: each segment gets exactly the shift
        # the global-min epilogue would give it alone.  min-of-row-mins
        # is the same float as one global min (min never rounds), so a
        # segment's rows are BITWISE what _normalize_impl produces for
        # that segment as its own matrix — the property the coalescing
        # service is built on (serve.py).
        row_min = jnp.min(counts, axis=1)
        seg_min = jax.ops.segment_min(row_min, seg_ids,
                                      num_segments=n_segments)
        counts = counts + jnp.abs(seg_min)[seg_ids][:, None]
        counts = accurate_log2(counts + 1.0)
    return counts


def normalize_counts_segmented(counts, seg_ids, n_segments: int, *,
                               log2_mode: str = LOG2_POST, mean, std):
    """Normalize independent row SEGMENTS of one matrix in one pass.

    For request coalescing (serve.py): several queries' rows are counted
    and normalized as one device batch, but Log2.post's global-|min|
    shift must not leak between requests — each segment is shifted by
    its own min, making every row bitwise-identical to normalizing its
    request alone.  ``mean``/``std`` must be PROVIDED vectors: computed
    column statistics over a coalesced batch would mix requests by
    construction (no segmented analog is offered on purpose — computed
    stats belong to corpus runs, not serving).

    ``seg_ids`` is a [rows] int array mapping each row to its request;
    ``n_segments`` is static — pad it (empty segments are harmless) to
    keep the compiled-shape space bounded.
    """
    if log2_mode not in (LOG2_PRE, LOG2_POST, LOG2_NONE):
        raise ValueError("log2 must be one of ['Log2.pre', 'Log2.post', 'Log2.none']")
    if mean is True or std is True or mean is False or std is False:
        raise ValueError("normalize_counts_segmented requires provided "
                         "mean/std vectors (got computed/skipped)")
    return aot_call(
        _normalize_segmented_impl,
        (jnp.asarray(counts), jnp.asarray(mean), jnp.asarray(std),
         jnp.asarray(seg_ids, jnp.int32)),
        dict(log2_mode=log2_mode, n_segments=int(n_segments)),
    )
