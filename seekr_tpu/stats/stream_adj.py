"""Bounded-memory multiple-comparison correction (extreme-scale adj_pval).

The in-memory chain (``stats.adj_pval`` -> ``stats.multitest``) holds the
full p-value matrix, its value vector, the sort permutation, and the
corrected vector in RAM — fine to GENCODE's 13k (84M triu values), fatal
at the 180k extreme (16G values: the matrix alone is 130 GB float32, and
the reference has the same flaw at seekr/adj_pval.py:93-129 on top of
statsmodels' own copies).  ``adj_pval_stream`` corrects a DISK-RESIDENT
matrix with bounded host memory:

  pass A   chunked scan of the memmapped input: extract the triu (or
           full) values, histogram their sort buckets (top 8 bits of an
           order-preserving bit transform), and partition (value,
           original-index) pairs into 256 bucket files — sequential
           writes only.
  sweep    process buckets in sorted order (descending for the
           suffix-min methods, ascending for prefix-max): each bucket is
           sorted in RAM (it is ~n/256 values), its global ranks are
           known from the histogram prefix sums, the corrected values
           are computed with the EXACT arithmetic of
           ``stats.multitest`` (same op order, float64), and the
           monotone carry (min/max so far) links buckets — bitwise
           identical to the one-shot accumulate.
  scatter  corrected values land at their original positions in the
           memmapped output matrix; bucket files are deleted as they
           are consumed, so peak disk is pairs + partially-written
           output, and peak RAM is one chunk + one bucket.

Every method the reference exposes (seekr/adj_pval.py:21-22) except
``hommel`` is supported — Hommel's adjustment is inherently O(n^2) over
the sorted vector (see multitest._hommel) and cannot stream; it raises
with a pointer to the in-memory path.

Correctness contract (pinned by tests/test_stream_adj.py): for every
supported method, streamed output == ``adj_pval`` in-memory output,
bitwise, including NaN propagation and the symmetric-triu NaN fill.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np

_SUFFIX_MIN = {"fdr_bh", "fdr_by", "simes-hochberg", "fdr_tsbh",
               "fdr_tsbky"}
_PREFIX_MAX = {"holm", "holm-sidak"}
_ELEMENTWISE = {"bonferroni", "sidak"}
_N_BUCKETS = 256


def _sortable_bits(vals: np.ndarray) -> np.ndarray:
    """Order-preserving unsigned-int transform of a float array.

    Standard total-order trick: flip all bits of negatives, set the sign
    bit of non-negatives.  Ascending unsigned order == ascending float
    order, with quiet NaNs (sign bit clear) above +inf — matching
    numpy's sort-NaNs-last convention that the in-memory path relies on.
    (A negative-signed NaN would sort first instead; p-values are
    computed as 1-cdf / ecdf and cannot produce one.)
    """
    if vals.dtype == np.float64:
        u = vals.view(np.uint64)
        sign = np.uint64(1) << np.uint64(63)
    else:
        u = np.ascontiguousarray(vals, np.float32).view(np.uint32)
        sign = np.uint32(1) << np.uint32(31)
    return np.where(u & sign, ~u, u | sign)


def _bucket_of(keys: np.ndarray) -> np.ndarray:
    shift = keys.dtype.itemsize * 8 - 8
    return (keys >> np.asarray(shift, keys.dtype)).astype(np.uint8)


class _BucketStore:
    """256 append-only (values, int64 index) pair files in a scratch dir."""

    def __init__(self, scratch: str, dtype):
        self.scratch = scratch
        self.dtype = np.dtype(dtype)
        self.counts = np.zeros(_N_BUCKETS, dtype=np.int64)
        self._vfh = [None] * _N_BUCKETS
        self._ifh = [None] * _N_BUCKETS

    def _files(self, b: int):
        if self._vfh[b] is None:
            self._vfh[b] = open(os.path.join(self.scratch, f"v{b:03d}"),
                                "ab")
            self._ifh[b] = open(os.path.join(self.scratch, f"i{b:03d}"),
                                "ab")
        return self._vfh[b], self._ifh[b]

    def add_chunk(self, vals: np.ndarray, idx: np.ndarray) -> None:
        """Partition one chunk by bucket (single stable counting sort)."""
        keys = _sortable_bits(vals)
        buckets = _bucket_of(keys)
        order = np.argsort(buckets, kind="stable")
        vals, idx, buckets = vals[order], idx[order], buckets[order]
        bounds = np.searchsorted(buckets, np.arange(_N_BUCKETS + 1,
                                                    dtype=np.int64))
        for b in range(_N_BUCKETS):
            lo, hi = bounds[b], bounds[b + 1]
            if lo == hi:
                continue
            vfh, ifh = self._files(b)
            vfh.write(vals[lo:hi].tobytes())
            ifh.write(idx[lo:hi].tobytes())
            self.counts[b] += hi - lo

    def close_writes(self):
        for fh in self._vfh + self._ifh:
            if fh is not None:
                fh.close()
        self._vfh = [None] * _N_BUCKETS
        self._ifh = [None] * _N_BUCKETS

    def read(self, b: int):
        """(values, indices) of one bucket, sorted ascending (stable)."""
        vp = os.path.join(self.scratch, f"v{b:03d}")
        vals = np.fromfile(vp, dtype=self.dtype)
        idx = np.fromfile(os.path.join(self.scratch, f"i{b:03d}"),
                          dtype=np.int64)
        order = np.argsort(_sortable_bits(vals), kind="stable")
        return vals[order], idx[order]

    def drop(self, b: int) -> None:
        for pre in ("v", "i"):
            try:
                os.unlink(os.path.join(self.scratch, f"{pre}{b:03d}"))
            except FileNotFoundError:
                pass


def _tiled_symmetric_mm(mm, tile: int = 4096) -> bool:
    """adj_pval's 5-decimal transpose test over a memmapped matrix —
    mirror tiles only, early exit, never a full-matrix copy."""
    m = mm.shape[0]
    for i0 in range(0, m, tile):
        i1 = min(i0 + tile, m)
        for j0 in range(i0, m, tile):
            j1 = min(j0 + tile, m)
            a = np.round(np.asarray(mm[i0:i1, j0:j1]), 5)
            bt = np.round(np.asarray(mm[j0:j1, i0:i1]), 5).T
            eq = a == bt
            if not eq.all():
                if not (eq | (np.isnan(a) & np.isnan(bt))).all():
                    return False
    return True


def _iter_value_chunks(mm, symmetric: bool, chunk_rows: int):
    """Yield (values, flat output indices int64) per row chunk.

    Symmetric mode yields only the strict upper triangle (matching
    utils.adj.triu_values row-major order per chunk); indices address
    the [m1, m2] output matrix row-major.
    """
    m1, m2 = mm.shape
    for i0 in range(0, m1, chunk_rows):
        i1 = min(i0 + chunk_rows, m1)
        block = np.asarray(mm[i0:i1])
        if not symmetric:
            idx = (np.arange(i0, i1, dtype=np.int64)[:, None] * m2
                   + np.arange(m2, dtype=np.int64)[None, :])
            yield block.reshape(-1), idx.reshape(-1)
            continue
        rows_i = np.arange(i0, i1, dtype=np.int64)
        cols = np.arange(m2, dtype=np.int64)
        mask = cols[None, :] > rows_i[:, None]
        idx = rows_i[:, None] * m2 + cols[None, :]
        yield block[mask], idx[mask]


def _ecdf_chunk(base: int, cnt: int, n: int, hsum: float) -> np.ndarray:
    """multitest._fdr_correct's ecdf buffer, restricted to global ranks
    [base, base+cnt) — same ops, same order, bitwise identical."""
    e = np.arange(base + 1.0, base + cnt + 1.0)
    e /= n
    if hsum:
        e /= hsum
    return e


def adj_pval_stream(pvals, method: str, alpha: float = 0.05,
                    outputname=None, out_npy=None, index=None,
                    columns=None, symmetric=None, scratch_dir=None,
                    chunk_cells: int = 32 << 20):
    """Multiple-comparison correction of a disk-resident p-value matrix.

    ``pvals``: path to a .npy artifact (memmapped; float32 or float64)
    or an in-memory array.  ``outputname`` writes the labeled CSV the
    in-memory ``adj_pval`` would (labels default to pandas-style
    0..m-1); ``out_npy`` writes the corrected float64 matrix as .npy.
    ``symmetric`` overrides the 5-decimal transpose detection (pass
    True/False when the caller already knows — the check itself is
    tiled and bounded, but reads the whole matrix once).  Returns None:
    results live on disk by design.
    """
    from seekr_tpu.stats.multitest import _METHOD_ALIASES, _harmonic_sum

    method = _METHOD_ALIASES.get(str(method).lower())
    if method is None:
        raise ValueError("method not recognized")
    if method == "hommel":
        raise ValueError(
            "hommel's adjustment is O(n^2) over the sorted vector and "
            "cannot stream; use stats.adj_pval (in-memory) for it")
    if not outputname and not out_npy:
        raise ValueError("adj_pval_stream writes artifacts only: pass "
                         "outputname= (csv) and/or out_npy= (.npy)")

    own_mm = isinstance(pvals, str)
    mm = np.load(pvals, mmap_mode="r") if own_mm else np.asarray(pvals)
    if mm.ndim != 2:
        raise ValueError(f"p-value matrix must be 2-D, got {mm.shape}")
    m1, m2 = (int(d) for d in mm.shape)
    if symmetric is None:
        symmetric = m1 == m2 and _tiled_symmetric_mm(mm)
    elif symmetric and m1 != m2:
        raise ValueError("symmetric=True needs a square matrix")
    # the in-memory path's user-facing mode messages (adj_pval.py parity)
    if symmetric:
        print("The input pvals is a symmetric matrix. Only the upper "
              "triangle of the matrix (excluding diagonal) is used for "
              "multiple comparison correction.")
    else:
        print("The input pvals is not a symmetric matrix. The total matrix "
              "is used for multiple comparison correction.")

    n = m1 * (m1 - 1) // 2 if symmetric else m1 * m2
    chunk_rows = max(1, int(chunk_cells) // max(1, m2))

    scratch = tempfile.mkdtemp(prefix="seekr_adj_",
                               dir=scratch_dir
                               or os.environ.get("SEEKR_TPU_SCRATCH"))
    out_path = out_npy or os.path.join(scratch, "out.npy")
    try:
        store = _BucketStore(scratch, mm.dtype)
        for vals, idx in _iter_value_chunks(mm, symmetric, chunk_rows):
            store.add_chunk(vals, idx)
        store.close_writes()
        assert int(store.counts.sum()) == n

        out = np.lib.format.open_memmap(out_path, mode="w+",
                                        dtype=np.float64, shape=(m1, m2))
        if symmetric:
            # lower triangle + diagonal are NaN in the in-memory output
            for i0 in range(0, m1, chunk_rows):
                out[i0:min(i0 + chunk_rows, m1)] = np.nan
        out_flat = out.reshape(-1)

        if n:
            _correct_sweep(store, out_flat, n, method, float(alpha),
                           _harmonic_sum(n) if method == "fdr_by" else 0.0)
        out.flush()

        if outputname:
            _emit_csv(out, f"{outputname}.csv", index, columns, chunk_rows)
    finally:
        if out_npy is None:
            # the matrix memmap was scratch-only (csv requested)
            try:
                del out_flat, out
            except NameError:
                pass
        shutil.rmtree(scratch, ignore_errors=True)
    return None


def _bucket_order(method: str):
    if method in _SUFFIX_MIN:
        return range(_N_BUCKETS - 1, -1, -1)
    return range(_N_BUCKETS)


def _correct_sweep(store: _BucketStore, out_flat, n: int, method: str,
                   alpha: float, hsum: float) -> None:
    bases = np.concatenate([[0], np.cumsum(store.counts)])[:-1]

    # two-stage FDR needs stage-1's reject count before any corrected
    # value can be scaled — one cheap extra sweep over the bucket values
    two_stage = method in ("fdr_tsbh", "fdr_tsbky")
    r1 = post = 0
    if two_stage:
        bky = method == "fdr_tsbky"
        alpha_prime = alpha / (1 + alpha) if bky else alpha
        post = (1 + alpha) if bky else 1.0
        r1 = _bh_reject_count(store, bases, n, alpha_prime)
        method_core = "fdr_bh"
    else:
        method_core = method

    carry = None  # running min (suffix) / max (prefix) across buckets
    for b in _bucket_order(method_core):
        cnt = int(store.counts[b])
        if cnt == 0:
            continue
        vals, idx = store.read(b)
        base = int(bases[b])
        p64 = np.asarray(vals, np.float64)

        if method_core == "bonferroni":
            corrected = np.clip(p64 * n, 0, 1)
        elif method_core == "sidak":
            corrected = np.clip(-np.expm1(n * np.log1p(-p64)), 0, 1)
        elif method_core in ("holm", "holm-sidak"):
            factors = np.arange(n - base, n - base - cnt, -1,
                                dtype=np.float64)
            pre = (p64 * factors if method_core == "holm"
                   else -np.expm1(factors * np.log1p(-p64)))
            np.maximum.accumulate(pre, out=pre)
            if carry is not None:
                np.maximum(pre, carry, out=pre)
            carry = pre[-1]
            corrected = np.clip(pre, 0, 1)
        elif method_core == "simes-hochberg":
            factors = np.arange(n - base, n - base - cnt, -1,
                                dtype=np.float64)
            pre = p64 * factors
            np.minimum.accumulate(pre[::-1], out=pre[::-1])
            if carry is not None:
                np.minimum(pre, carry, out=pre)
            carry = pre[0]
            corrected = np.clip(pre, 0, 1)
        else:  # fdr_bh / fdr_by core
            pre = p64 / _ecdf_chunk(base, cnt, n, hsum)
            np.minimum.accumulate(pre[::-1], out=pre[::-1])
            if carry is not None:
                np.minimum(pre, carry, out=pre)
            carry = pre[0]
            corrected = np.clip(pre, 0, 1)

        if two_stage:
            # multitest: np.clip(corr1 * post * ntests0 / n, 0, 1) with
            # ntests0 = n - r1 — reproduce the exact op order
            if r1 == 0 or r1 == n:
                corrected = np.clip(corrected * post, 0, 1)
            else:
                corrected = np.clip(corrected * post * (n - r1) / n, 0, 1)

        out_flat[idx] = corrected


def _bh_reject_count(store: _BucketStore, bases, n: int,
                     alpha: float) -> int:
    """Stage-1 BH reject count: the last global rank r with
    p_sorted[r] <= ecdf[r] * alpha (multitest._fdr_correct's rule,
    same arithmetic), +1.  One ascending value-only sweep."""
    last = -1
    for b in range(_N_BUCKETS):
        cnt = int(store.counts[b])
        if cnt == 0:
            continue
        vals, _ = store.read(b)
        base = int(bases[b])
        thr = _ecdf_chunk(base, cnt, n, 0.0)
        thr *= alpha
        below = np.asarray(vals, np.float64) <= thr
        nz = np.nonzero(below)[0]
        if nz.size:
            last = base + int(nz.max())
    return last + 1


def _emit_csv(out_mm, path: str, index, columns, chunk_rows: int) -> None:
    """Stream the corrected matrix to the labeled CSV ``adj_pval`` would
    write (float64 shortest-repr cells, NaN as empty — pandas bytes)."""
    from seekr_tpu.io.stream import StreamingCsvWriter

    m1, m2 = out_mm.shape
    if columns is None:
        columns = [str(i) for i in range(m2)]
    if index is None:
        index = [str(i) for i in range(m1)]
    writer = StreamingCsvWriter(path, columns=columns, row_labels=index,
                                fmt="%s")
    for i0 in range(0, m1, chunk_rows):
        writer.append(np.asarray(out_mm[i0:min(i0 + chunk_rows, m1)]))
    writer.close()
