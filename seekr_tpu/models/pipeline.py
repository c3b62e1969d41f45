"""SeekrPipeline — the flagship end-to-end jittable compute graph.

One traced function takes encoded bases straight to the all-pairs Pearson
matrix:

    bases [m, L] int8, lengths [m]
      -> MXU histogram counts [m, 4^k]        (ops.count)
      -> fused normalize epilogue             (ops.normalize)
      -> row-standardized GEMM r-matrix [m,m] (ops.pearson)

This is the unit the driver compile-checks (see __graft_entry__.py) and the
unit the distributed layer shards over a mesh (seekr_tpu.parallel.dist).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


from seekr_tpu.ops.math import accurate_log2

from seekr_tpu.ops.count import count_graph
from seekr_tpu.ops.normalize import LOG2_NONE, LOG2_POST, LOG2_PRE


def _normalize_graph(counts, mean, std, log2_mode):
    """Inline (jit-composable) version of the normalize epilogue.

    mean/std are either arrays (precomputed norm vectors) or None (compute
    column statistics from the data, matching BasicCounter mean=True/std=True).
    """
    counts = counts.astype(jnp.float32)
    if log2_mode == LOG2_PRE:
        counts = accurate_log2(counts + 1.0)
    # provided norm vectors are flat [4^k]; reshape to the count tensor's
    # trailing dims (free — row-major bytes are the flat order) so the
    # unflattened 3-D path broadcasts correctly
    # cast like ops/normalize._normalize_impl: float64 .npy artifact
    # vectors under jax_enable_x64 would otherwise promote the whole
    # pipeline (including the Pearson GEMM) to float64
    if mean is not None:
        mean = jnp.asarray(mean, dtype=jnp.float32).reshape(counts.shape[1:])
    if std is not None:
        std = jnp.asarray(std, dtype=jnp.float32).reshape(counts.shape[1:])
    mean = jnp.mean(counts, axis=0) if mean is None else mean
    counts = counts - mean
    std = jnp.std(counts, axis=0) if std is None else std
    counts = counts / std
    if log2_mode == LOG2_POST:
        counts = counts + jnp.abs(jnp.min(counts))
        counts = accurate_log2(counts + 1.0)
    # norm-vector outputs are always flat [4^k] regardless of the count
    # tensor's layout (tiny; callers consume them as .npy artifacts)
    return counts, mean.reshape(-1), std.reshape(-1)


# rows at or below this get the forced-flat GEMM layout (see forward).
# Note: the flat vs 3-D layouts reduce columns in different XLA orders,
# so normalized values / mean / std can differ at the ulp level (~1e-6
# rel) across the gate or across counts(flat=...) choices — same-config
# runs are bitwise reproducible; cross-layout comparisons are allclose,
# not array_equal (BasicCounter/normalize_counts, which all CLI
# artifacts use, always computes in one layout and has no such gate)
_GEMM_FLAT_MAX_ROWS = 4096


class SeekrPipeline:
    """Fused count -> normalize -> Pearson pipeline for one device.

    Parameters
    ----------
    k : k-mer size (default 6, the reference CLI default)
    log2 : 'Log2.pre' | 'Log2.post' | 'Log2.none'
    """

    def __init__(self, k: int = 6, log2: str = LOG2_POST):
        if log2 not in (LOG2_PRE, LOG2_POST, LOG2_NONE):
            raise ValueError("log2 must be one of ['Log2.pre', 'Log2.post', 'Log2.none']")
        self.k = k
        self.log2 = log2

    def counts(self, bases, lengths, mean=None, std=None, flat=True):
        """Normalized counts (+ the mean/std used).

        ``flat=False`` keeps the count tensor in its unflattened
        [m, n_hi, n_lo] device layout (ops.count_graph): the flatten is a
        relayout copy on TPU, and the Pearson contraction consumes the
        3-D form directly.  The returned mean/std stay flat [4^k] either
        way (they are tiny; reshaping them is free).
        """
        raw = count_graph(bases, lengths, self.k, flat=flat)
        return _normalize_graph(raw, mean, std, self.log2)

    def forward(self, bases, lengths, mean=None, std=None) -> jax.Array:
        """Full pipeline: encoded sequences -> [m, m] Pearson r matrix."""
        from seekr_tpu.ops.pearson import pearson_graph

        raw = count_graph(bases, lengths, self.k, flat=False)
        if bases.shape[0] <= _GEMM_FLAT_MAX_ROWS:
            # XLA otherwise carries the kernel's 3-D tiled layout through
            # normalize into the Pearson GEMM, which traces ~55% slower on
            # the 3-D contraction layout at small m (0.943 vs 0.605 ms at
            # m=2048; BASELINE.md).  The barrier forces one small flat
            # relayout (~0.04 ms) and buys the fast GEMM — measured +21%
            # end-to-end at m=2048, fading to noise by m=8192 and net
            # NEGATIVE at 13k (the relayout grows, the GEMM stops caring),
            # hence the row gate.
            raw = jax.lax.optimization_barrier(
                raw.reshape(raw.shape[0], -1))
        normalized, _, _ = _normalize_graph(raw, mean, std, self.log2)
        return pearson_graph(normalized)

    def jit_forward(self):
        return jax.jit(self.forward)
