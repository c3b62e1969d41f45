"""All-pairs Pearson correlation as a tiled XLA GEMM.

Semantics follow the reference (seekr/pearson.py:32-44): optionally
row-standardize both matrices (per-row mean and POPULATION std, ddof=0),
then ``r = inner(c1, c2) / n_cols``.  On TPU the inner product is a single
``dot_general`` that XLA tiles onto the MXU; float32 with HIGHEST precision
keeps parity with numpy BLAS within 1e-5.

For outputs too large for one buffer, ``pearson_blocked`` streams row blocks
of the left operand (used by the background-distribution path where
m ~ 13k-180k).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from seekr_tpu.ops.precision import pearson_precision
from seekr_tpu.utils.aot import aot_call


@jax.jit
def _row_standardize(c):
    # axis 0 = rows (sequences); every trailing axis is feature data — a
    # 3-D [m, n_hi, n_lo] unflattened count tensor standardizes exactly
    # like its flattened [m, 4^k] view (see ops.count_graph flat=False)
    feat = tuple(range(1, c.ndim))
    c = c.astype(jnp.float32)
    c = c - jnp.mean(c, axis=feat, keepdims=True)
    return c / jnp.std(c, axis=feat, keepdims=True)


def pearson_graph(c: jax.Array) -> jax.Array:
    """Traced (jit-composable) self-Pearson: row-standardize + Gram / n.

    The shared building block for the fused pipeline and the sharded
    distributed pipeline; equivalent to ``pearson_device(c, c)``.
    Accepts the unflattened 3-D count tensor too — contracting over both
    trailing axes skips the [m, n_hi, n_lo] -> [m, 4^k] relayout copy the
    flatten would cost on TPU (the GEMM is identical either way).
    """
    c = _row_standardize(c)  # one standardize recipe package-wide
    feat = tuple(range(1, c.ndim))
    sim = jax.lax.dot_general(
        c, c,
        dimension_numbers=((feat, feat), ((), ())),
        preferred_element_type=jnp.float32,
        precision=pearson_precision(),
    )
    n_cols = 1
    for d in feat:
        n_cols *= c.shape[d]
    return sim / n_cols


@functools.partial(jax.jit, static_argnames=("row_standardize",))
def _pearson_device_impl(counts1, counts2, row_standardize: bool = True
                         ) -> jax.Array:
    c1 = jnp.asarray(counts1, dtype=jnp.float32)
    c2 = jnp.asarray(counts2, dtype=jnp.float32)
    if row_standardize:
        c1 = _row_standardize(c1)
        c2 = _row_standardize(c2)
    dist = jax.lax.dot_general(
        c1, c2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=pearson_precision(),
    )
    return dist / c1.shape[1]


def pearson_device(counts1, counts2, row_standardize: bool = True) -> jax.Array:
    """[m1, n] x [m2, n] -> [m1, m2] Pearson r matrix (float32).

    Host-level entry: routes through the AOT executable store
    (utils.aot) so a fresh CLI process skips the backend compile.
    """
    return aot_call(_pearson_device_impl, (counts1, counts2),
                    dict(row_standardize=row_standardize))


def standardize_rows(counts) -> jax.Array:
    """Row-standardized device copy (the Pearson left/right operand form).

    For repeated-query serving: standardize a fixed target matrix ONCE
    and score every query batch against it with
    ``pearson_against_standardized`` — skips the per-call re-standardize
    HBM pass over the (large) target matrix that ``pearson_device`` pays.
    """
    return aot_call(_row_standardize, (jnp.asarray(counts, jnp.float32),))


@jax.jit
def _pearson_vs_std_impl(c1, t_std):
    c1 = _row_standardize(c1)
    dist = jax.lax.dot_general(
        c1, t_std,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=pearson_precision(),
    )
    return dist / c1.shape[1]


def pearson_against_standardized(counts1, targets_std) -> jax.Array:
    """[q, n] raw x [t, n] PRE-standardized -> [q, t] Pearson r matrix.

    Bitwise-identical to ``pearson_device(counts1, targets)`` when
    ``targets_std = standardize_rows(targets)`` — the standardize is the
    same graph either way, just hoisted out of the per-query path.
    """
    return aot_call(_pearson_vs_std_impl, (counts1, targets_std))


def pearson_pairs(counts, ii, jj, row_standardize: bool = True,
                  chunk: int = 65536) -> np.ndarray:
    """r-values of selected row pairs, without forming any r-matrix.

    ``out[t] = pearson(counts[ii[t]], counts[jj[t]])``.  Device work is
    O(pairs * n) gather + elementwise dot instead of the full O(m^2 n)
    GEMM — the engine behind sampled find_dist at the 180k-transcript
    extreme (SURVEY.md hard part 5), where only ``subset_size`` of the
    m(m-1)/2 pool is ever fitted (seekr/find_dist.py:166-171).

    Rows are standardized once on device; pairs are gathered in fixed-size
    chunks so one shape compiles regardless of the pair count.  Elementwise
    float32 multiply-accumulate is at least as accurate as the GEMM path
    (tests pin allclose vs pearson_device at 1e-5).
    """
    c = jnp.asarray(counts, dtype=jnp.float32)
    if row_standardize:
        c = aot_call(_row_standardize, (c,))
    ii = np.asarray(ii, dtype=np.int32)
    jj = np.asarray(jj, dtype=np.int32)
    m = int(c.shape[0])
    for name, arr in (("ii", ii), ("jj", jj)):
        # validate host-side: jnp.take silently CLAMPS out-of-range
        # indices, which would return a plausible-looking wrong r-value
        # where the reference's numpy indexing raises
        if arr.size and (int(arr.min()) < -m or int(arr.max()) >= m):
            raise IndexError(
                f"{name} contains indices outside [-{m}, {m}) for a "
                f"{m}-row count matrix")
    ii = np.where(ii < 0, ii + m, ii).astype(np.int32)
    jj = np.where(jj < 0, jj + m, jj).astype(np.int32)
    n_pairs = ii.size
    out = np.empty(n_pairs, dtype=np.float32)
    if n_pairs == 0:
        return out
    # next power of two >= n_pairs, capped: O(log) compiled shapes
    # across arbitrary subset sizes instead of one fresh 20-60 s remote
    # compile per distinct pair count (the padding already makes the
    # oversize tail free)
    chunk = int(min(chunk, 1 << max(0, n_pairs - 1).bit_length()))

    pad = np.zeros(chunk, dtype=np.int32)
    for start in range(0, n_pairs, chunk):
        end = min(start + chunk, n_pairs)
        a, b = pad.copy(), pad.copy()  # padded tail rows: computed, dropped
        a[:end - start] = ii[start:end]
        b[:end - start] = jj[start:end]
        vals = np.asarray(aot_call(_pair_dot, (c, a, b)))
        out[start:end] = vals[:end - start]
    return out


@jax.jit
def _pair_dot(cc, a_idx, b_idx):
    a = jnp.take(cc, a_idx, axis=0)
    b = jnp.take(cc, b_idx, axis=0)
    return jnp.sum(a * b, axis=1) / cc.shape[1]


class _RowFiller:
    """Writer that fills a preallocated array with streamed row blocks."""

    def __init__(self, out: np.ndarray):
        self.out = out
        self.row = 0

    def append(self, block):
        block = np.asarray(block)
        self.out[self.row:self.row + block.shape[0]] = block
        self.row += block.shape[0]


def pearson_blocked(counts1, counts2, row_standardize: bool = True,
                    block_rows: int = 4096) -> np.ndarray:
    """Row-blocked Pearson for outputs too large to hold on device at once.

    The blocked GEMM recipe lives in ONE place — io.stream.stream_pearson —
    driven here into a preallocated host array.
    """
    from seekr_tpu.io.stream import stream_pearson

    m1 = np.shape(counts1)[0]
    m2 = np.shape(counts2)[0]
    out = np.empty((m1, m2), dtype=np.float32)
    stream_pearson(counts1, counts2, _RowFiller(out), block_rows=block_rows,
                   row_standardize=row_standardize)
    return out
