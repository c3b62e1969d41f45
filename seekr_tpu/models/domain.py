"""Sliding-window domain Pearson: locate query-like domains inside targets.

Reconstructs the legacy ``seekr.pearson.DomainPearson`` /
``seekr_domain_pearson`` surface that the reference removed in its 2.0
rewrite.  Unlike the other restored legacy capabilities this one has no
shipped tests pinning exact behavior (its reference test class is an
empty TODO, /root/reference/seekr/tests/test_pearson.py:27-29), so the
contract below is reconstructed from the reference CHANGELOG record
(1.3.0 "seekr_domain_pearson command line script compares queries and
domains in targets"; 1.4.0 "percentiles ... now relative to a reference
fasta"; 1.5.x "--log2 compatibility", "can run without reference path")
with the design choices documented here:

  * each *query* transcript is k-mer-profiled whole; each *target* is
    tiled into windows of ``window`` bases every ``slide`` bases, and
    every (query, window) pair gets a Pearson r — peaks along a target
    mark domains with query-like k-mer composition.
  * a target shorter than ``window`` contributes one window (the whole
    sequence); otherwise only full-length windows are tiled, so up to
    ``slide - 1`` trailing bases past the last full window fall outside
    every window.
  * with a ``reference_path``, each r additionally gets a percentile
    (mean-rank semantics, = scipy ``percentileofscore(kind='mean')``)
    within that query's r-distribution against the reference sequences;
    without one, percentiles are simply skipped.
  * ``mean``/``std`` follow KmerCounter semantics and are applied to
    queries, windows, and reference alike so the profiles share one
    normalization frame.  When left ``True`` the vectors are computed
    from the reference fasta if given, else from the target windows —
    pass precomputed GENCODE vectors for production use.
  * under ``Log2.post``/``Log2.pre`` the log transform's global-min
    shift is computed over each counted matrix (faithful BasicCounter
    semantics), so the window BATCH is the unit of normalization; with
    ``Log2.none`` profiles are fully window-independent.

TPU-first shape: all windows of all targets are tiled host-side into ONE
row batch and counted in a single bucketed device pass (the Pallas
histogram kernel, ops/count.py), then correlated against the query
profiles with one blocked MXU GEMM (ops/pearson.py) — there is no
per-window Python loop on the hot path, and 10k windows cost the same
dispatch overhead as 10.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from seekr_tpu.io.fasta import Reader
from seekr_tpu.models.counter import KmerCounter
from seekr_tpu.models.pearson import pearson
from seekr_tpu.ops.normalize import normalize_counts
from seekr_tpu.utils.logging import stage_timer


def tile_windows(seq: str, window: int, slide: int) -> List[Tuple[int, str]]:
    """(start, window-string) tiles of one sequence.

    Full windows every ``slide`` bases; a sequence shorter than
    ``window`` yields a single whole-sequence window.
    """
    if window <= 0 or slide <= 0:
        raise ValueError("window and slide must be positive")
    if len(seq) <= window:
        return [(0, seq)]
    return [(s, seq[s:s + window])
            for s in range(0, len(seq) - window + 1, slide)]


def percentile_of_scores(null: np.ndarray, scores: np.ndarray) -> np.ndarray:
    """Percentile of each score within ``null`` (mean-rank semantics).

    Vectorized equivalent of ``scipy.stats.percentileofscore(null, s,
    kind='mean')``: 100 * (#strictly-below + #at-or-below) / (2 * n).

    NaN-correct like scipy: a NaN SCORE yields a NaN percentile (a
    zero-variance window's undefined r must never surface as a fake
    100th-percentile hit — searchsorted would rank NaN above every
    finite value), and NaN NULL entries are excluded from the ranking
    denominator instead of silently deflating every percentile.
    """
    null_arr = np.asarray(null, dtype=np.float64)
    null_sorted = np.sort(null_arr[~np.isnan(null_arr)])
    s = np.asarray(scores, dtype=np.float64)
    lo = np.searchsorted(null_sorted, s, side="left")
    hi = np.searchsorted(null_sorted, s, side="right")
    n = max(len(null_sorted), 1)
    out = 100.0 * (lo + hi) / (2.0 * n)
    return np.where(np.isnan(s), np.nan, out)


class DomainPearson:
    """Pearson r of query k-mer profiles vs sliding windows of targets.

    Parameters
    ----------
    query_path : fasta of query transcripts (profiled whole)
    target_path : fasta of target sequences (tiled into windows)
    reference_path : optional fasta providing the percentile null
        distribution (and the normalization frame when ``mean``/``std``
        are ``True``)
    r_values_path / percentiles_path : optional CSV artifact paths
        (rows = windows labeled ``<target>|<start>``, columns = queries)
    mean, std : KmerCounter normalization controls (``True`` | array |
        ``.npy`` path | ``False``), shared by all three count sets
    log2 : 'Log2.pre' | 'Log2.post' | 'Log2.none'
    k : k-mer size
    window : window width in bases
    slide : window stride in bases
    """

    def __init__(self, query_path=None, target_path=None,
                 reference_path=None, r_values_path=None,
                 percentiles_path=None, mean=True, std=True,
                 log2="Log2.post", k=6, window=1000, slide=100):
        self.query_path = query_path
        self.target_path = target_path
        self.reference_path = reference_path
        self.r_values_path = r_values_path
        self.percentiles_path = percentiles_path
        self.mean = np.load(mean) if isinstance(mean, str) else mean
        self.std = np.load(std) if isinstance(std, str) else std
        self.log2 = log2
        self.k = int(k)
        self.window = int(window)
        self.slide = int(slide)

        self.query_names: List[str] = []
        self.target_names: List[str] = []
        self.window_labels: List[str] = []
        # [n_windows, n_queries] frames, aligned with window_labels
        self.r_values = None
        self.percentiles = None

    # -- internals ---------------------------------------------------------

    def _raw_for(self, seqs: Sequence[str]) -> np.ndarray:
        """Raw counts-per-kb profiles of in-memory sequences (one device
        pass; normalization is applied separately so no set is counted
        twice)."""
        counter = KmerCounter(k=self.k, mean=False, std=False,
                              log2="Log2.none", silent=True)
        counter.seqs = list(seqs)
        return counter._raw_counts()

    def _normalized(self, raw: np.ndarray, mean, std) -> np.ndarray:
        """Apply the shared normalization frame to a raw count matrix."""
        out, _, _ = normalize_counts(raw, log2_mode=self.log2,
                                     mean=mean, std=std)
        return np.asarray(out)

    @staticmethod
    def _short_name(header: str) -> str:
        """Row/column label: fasta header up to the first '|'."""
        name = header.lstrip(">").split("|")[0].strip()
        return name or header.lstrip(">")

    # -- public API --------------------------------------------------------

    def split_targets(self):
        """Tile every target into (label, window-string) pairs."""
        reader = Reader(self.target_path)
        seqs = reader.get_seqs()
        headers = reader.get_headers()
        raw_names = [self._short_name(h) for h in headers]
        # de-duplicate pre-'|' short names pandas-mangle style: two
        # targets sharing a short name would otherwise mint identical
        # window labels ('chr1|0' twice), silently corrupting .loc
        # lookups on the r_values/percentiles artifacts
        seen: dict = {}
        self.target_names = []
        for n in raw_names:
            c = seen.get(n, 0)
            seen[n] = c + 1
            self.target_names.append(n if c == 0 else f"{n}.{c}")
        labels, window_seqs = [], []
        for name, seq in zip(self.target_names, seqs):
            for start, wseq in tile_windows(seq, self.window, self.slide):
                labels.append(f"{name}|{start}")
                window_seqs.append(wseq)
        self.window_labels = labels
        return window_seqs

    def run(self):
        """Count, correlate, (optionally) rank, and write artifacts.

        Returns the r-value DataFrame ([windows x queries]); also sets
        ``self.r_values`` and — when a reference fasta was provided —
        ``self.percentiles``.
        """
        import pandas as pd

        qreader = Reader(self.query_path)
        query_seqs = qreader.get_seqs()
        self.query_names = [self._short_name(h)
                            for h in qreader.get_headers()]
        window_seqs = self.split_targets()
        ref_seqs = (Reader(self.reference_path).get_seqs()
                    if self.reference_path else None)
        if self.percentiles_path and ref_seqs is None:
            print("WARNING: --percentiles_path was given without "
                  "--reference; percentiles need a reference null "
                  "distribution, so no percentiles file will be written.")

        with stage_timer("domain_pearson", items=len(window_seqs),
                         unit="windows"):
            # one device count pass per set; the normalization frame is
            # derived from the basis raw counts, never by re-counting
            query_raw = self._raw_for(query_seqs)
            window_raw = self._raw_for(window_seqs)
            ref_raw = (self._raw_for(ref_seqs)
                       if ref_seqs is not None else None)

            mean, std = self.mean, self.std
            basis_norm = basis = None
            if mean is True or std is True:
                basis = ref_raw if ref_raw is not None else window_raw
                if std is True and basis.shape[0] == 1:
                    raise ValueError(
                        "You cannot standardize a single sequence. "
                        "Please pass the path to an std. dev. array, "
                        "or use raw counts by setting std=False.")
                basis_norm, bmean, bstd = normalize_counts(
                    basis, log2_mode=self.log2, mean=mean, std=std)
                if mean is True:
                    mean = np.asarray(bmean)
                if std is True:
                    std = np.asarray(bstd)

            def normalized(raw):
                # deriving bmean/bstd already produced the fully
                # normalized basis matrix (same vectors, same op order)
                # — reuse it instead of a second elementwise HBM pass
                # over the largest matrix of the run
                if raw is basis:
                    return np.asarray(basis_norm)
                return self._normalized(raw, mean, std)

            query_counts = normalized(query_raw)
            window_counts = normalized(window_raw)
            # [n_windows, n_queries]: windows batch through the device
            # counter once; one blocked GEMM covers every pair
            r = pearson(window_counts, query_counts)

        self.r_values = pd.DataFrame(r, index=self.window_labels,
                                     columns=self.query_names)
        if self.r_values_path:
            self.r_values.to_csv(self.r_values_path)

        if ref_seqs is not None:
            ref_counts = normalized(ref_raw)
            null = pearson(query_counts, ref_counts)  # [q, n_ref]
            pct = np.empty_like(r)
            for j in range(r.shape[1]):
                pct[:, j] = percentile_of_scores(null[j], r[:, j])
            self.percentiles = pd.DataFrame(pct, index=self.window_labels,
                                            columns=self.query_names)
            if self.percentiles_path:
                self.percentiles.to_csv(self.percentiles_path)

        return self.r_values
