"""Weight k-mer count profiles by protein-binding motif PWMs.

Reconstructs the legacy ``seekr.pwm.CountsWeighter`` / ``seekr_pwms``
surface that the reference removed in its 2.0 rewrite; the behavior is
pinned by its shipped legacy tests
(/root/reference/seekr/tests/test_pwm.py, fixture
tests/data/pwms/M001_0.6.txt; CHANGELOG 1.3.0 "seekr_pwms is now callable
from the command line").

A position-weight matrix (PWM) gives per-position base probabilities of a
binding motif.  Each k-mer's weight is the sum over all alignments of the
k-mer inside the motif of the product of matched-base probabilities; a
sequence's score for the motif is then the weight-vector dot its k-mer
count row.  Scoring all sequences against all PWMs is
``counts [m, 4^k] @ weights [4^k, n_pwms]`` — a GEMM in principle, but
PWM collections are small (hundreds) and the weight construction is
dict-driven host work, so this stays on host by design (the counts matrix
itself comes from the device pipeline).
"""

from __future__ import annotations

from collections import defaultdict
from itertools import product
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple, Union

import numpy as np
import pandas as pd

CountsLike = Union[str, np.ndarray, pd.DataFrame, None]


class CountsWeighter:
    """Score k-mer count profiles against a directory of PWM files.

    Parameters
    ----------
    pwm_dir : directory of tab-separated PWM files (columns ``Pos``,
        ``A``, ``C``, ``G``, ``U``/``T``; one row per motif position)
    counts : k-mer counts as a DataFrame, an ndarray, or a path to a
        ``.npy``/CSV artifact produced by the counting pipeline
    k : k-mer size of the counts' columns
    out_path : optional CSV path for the scores written by :meth:`run`
    """

    def __init__(self, pwm_dir: Optional[str] = None,
                 counts: CountsLike = None, k: int = 5,
                 out_path: Optional[str] = None):
        self.pwm_dir = pwm_dir
        self.k = k
        self.out_path = out_path
        # AGTC product order — identical to the counting pipeline's
        # column order (models/counter.py)
        self.kmers = ["".join(p) for p in product("AGTC", repeat=k)]
        self.counts = None if counts is None else self.get_counts(counts)
        self.df: Optional[pd.DataFrame] = None

    def get_counts(self, counts: CountsLike) -> pd.DataFrame:
        """Coerce counts input (path / ndarray / DataFrame) to a DataFrame."""
        if isinstance(counts, str):
            if counts.endswith(".npy"):
                counts = np.load(counts)
            else:
                return pd.read_csv(counts, index_col=0)
        if isinstance(counts, pd.DataFrame):
            return counts
        return pd.DataFrame(counts, columns=self.kmers)

    def gen_pwm_dicts(self) -> Iterator[Tuple[Path, Dict]]:
        """Yield (path, {base: {position_index: probability}}) per PWM file."""
        if self.pwm_dir is None:
            raise ValueError("pwm_dir is required to iterate PWM files")
        for path in sorted(Path(self.pwm_dir).glob("*.txt")):
            table = (pd.read_csv(path, sep="\t")
                     .rename(columns={"U": "T"})
                     .drop(columns=["Pos"], errors="ignore"))
            yield path, table.to_dict()

    @staticmethod
    def set_kmer2weight(kmer2weight: Dict, pwm: Dict, sub_kmer: str,
                        kmer: str, window: int) -> None:
        """Add ``sub_kmer``'s summed alignment products to ``kmer``'s weight.

        For every alignment offset of a ``window``-long word inside the
        motif, multiply the matched per-position probabilities and
        accumulate onto ``kmer2weight[kmer]``.
        """
        n_positions = len(pwm[sub_kmer[0]])
        for start in range(n_positions - window + 1):
            weight = 1.0
            for i in range(window):
                weight *= pwm[sub_kmer[i]][start + i]
            kmer2weight[kmer] += weight

    def build_weights_dict(self, pwm: Dict) -> Dict[str, float]:
        """Weight of every k-mer against one PWM.

        When the motif is shorter than k, every ``window``-long sub-word
        of the k-mer is scored against the whole motif instead.
        """
        n_positions = len(pwm["A"])
        window = min(self.k, n_positions)
        kmer2weight: Dict[str, float] = defaultdict(int)
        for kmer in self.kmers:
            for start in range(self.k - window + 1):
                self.set_kmer2weight(kmer2weight, pwm,
                                     kmer[start:start + window], kmer, window)
        return kmer2weight

    def weight_counts(self, kmer2weight: Dict[str, float]) -> np.ndarray:
        """Per-sequence motif score: counts row . weight vector."""
        weights = np.array([kmer2weight[kmer] for kmer in self.counts.columns])
        return self.counts.values @ weights

    def run(self) -> pd.DataFrame:
        """Score every sequence against every PWM in ``pwm_dir``.

        Returns (and stores as ``self.df``) a DataFrame with one row per
        PWM file and one column per sequence; written to ``out_path`` as
        CSV when set.
        """
        if self.counts is None:
            raise ValueError("counts are required to run the weighting")
        # a counts artifact built with a different k would score 0 for
        # every column (weight lookups miss the defaultdict silently) —
        # fail loudly instead of writing a structurally-valid all-zero CSV
        kmer_set = set(self.kmers)
        unknown = [c for c in self.counts.columns if c not in kmer_set]
        if unknown:
            raise ValueError(
                f"counts columns do not match k={self.k} k-mers (e.g. "
                f"{unknown[0]!r}); pass the k the counts artifact was "
                f"built with")
        data = {}
        for path, pwm in self.gen_pwm_dicts():
            kmer2weight = self.build_weights_dict(pwm)
            data[path.name] = self.weight_counts(kmer2weight)
        self.df = pd.DataFrame(data).T
        if self.out_path:
            self.df.to_csv(self.out_path)
        return self.df
