"""KmerCounter — the TPU-backed equivalent of the reference BasicCounter.

API/behavior parity with seekr/kmer_counts.py:48-262 (constructor signature,
attribute names, error messages, artifact formats), but counting and
normalization run on the accelerator:

  FASTA -> 2-bit encode + length buckets (host)   seekr_tpu.io.encode
        -> MXU outer-product histogram (device)   seekr_tpu.ops.count
        -> fused normalize epilogue (device)      seekr_tpu.ops.normalize
        -> float32 numpy matrix + CSV/NPY artifacts (host)

Deviations (documented, all within the reference's own test tolerances):
  * occurrences are counted as integers and scaled once by
    1000/(len-k+1) instead of accumulating the float increment per window
    (reference kmer_counts.py:144-147) — mathematically identical, more
    accurate.
  * sequences shorter than k yield an all-zero row instead of raising
    ZeroDivisionError when len == k-1.
  * non-4-letter alphabets use a vectorized host path (TPU path assumes the
    2-bit encoding).
  * lowercase (soft-masked) bases are invalid window members exactly like
    the reference (its k-mer map holds uppercase keys only) — relevant
    only for manually-assigned ``.seqs``; file input is upper-cased by the
    readers.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from seekr_tpu.io.encode import encode_fasta, encode_seqs, kmer_strings
from seekr_tpu.io.fasta import Reader
from seekr_tpu.ops.count import count_kmers_device, count_kmers_host
from seekr_tpu.ops.normalize import normalize_counts
from seekr_tpu.utils.logging import stage_timer
from seekr_tpu.utils.progress import my_tqdm


class Log2:
    """String-valued stand-in for the reference's (commented-out) Log2 enum.

    The reference passes log2 modes as the strings 'Log2.pre'/'Log2.post'/
    'Log2.none' (seekr/kmer_counts.py:133-135); these attributes equal those
    strings so both spellings work.
    """

    pre = "Log2.pre"
    post = "Log2.post"
    none = "Log2.none"


# Cap on rows per compiled bucket.  The round-1 value (512) was sized for
# the XLA scan path's HBM-materialized one-hots; the round-2 Pallas kernel
# keeps one-hots in VMEM and is ~2x more efficient at m=2048 than m=512
# (fixed launch/convert overhead amortizes — BASELINE.md m-scaling table),
# and fewer, larger dispatches also cut per-dispatch latency.  Transient
# device memory stays modest (bases [2048, L<=16384] int8 = 32 MB max).
_MAX_ROWS_PER_BUCKET = 2048

# Sequences longer than this are counted via the chunked (sequence-parallel)
# path instead of padding a power-of-two bucket to their full length — e.g.
# the 88kb Airn transcript would otherwise force a 131072-column bucket.
_LONG_SEQ_THRESHOLD = 16384


def _has_nan(arr) -> bool:
    """Device-side NaN probe: one reduction + a scalar fetch, so the
    standardization warning does not force the whole matrix to host.

    Routed through the AOT executable store like every other per-call
    graph — on the tunneled backend even a trivial eager op costs a
    fresh remote compile per process."""
    from seekr_tpu.utils.aot import aot_call

    return bool(np.asarray(aot_call(_isnan_any_impl, (arr,))))


@jax.jit
def _isnan_any_impl(x):
    return jnp.isnan(x).any()


@functools.partial(jax.jit, static_argnames=("m",))
def _assemble_impl(blocks, dest, *, m: int):
    """Scatter per-bucket count blocks into one [m, n_cols] file-order matrix.

    ``blocks`` is a tuple of [rows_i, n_cols] device arrays INCLUDING any
    bucket row padding; ``dest`` holds the file-order row id of every
    block row, concatenated in block order, with pad rows pointing at
    ``m`` — a TRASH row inside an [m+1, n_cols] buffer that the final
    slice discards.  The compiled graph therefore keys only on the
    PADDED block shapes and ``m``.  That matters: padded shapes are
    powers of two (O(log) distinct values) while the exact per-bucket
    keep counts vary with every length mix — keying on keep made each
    novel mix a fresh backend compile, which the serving path pays per
    query batch (measured live: 1.1 s over the tunnel vs 60 ms warm;
    BASELINE.md round-5 serve-jitter note).  Routed through the AOT
    store so a fresh process pays zero backend compiles for a seen
    shape.

    Every index is IN RANGE by construction — deliberately.  The first
    cut used out-of-range pads with ``mode="drop"``, and the TPU
    backend miscompiled exactly the [m=2, 256-column] output shape
    (row 0's update was dropped along with the pads; fuzz seeds 32/33
    caught it).  In-range scatter is portable; the duplicate pad
    updates race only against each other on the trash row, which is
    discarded.
    """
    cat = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=0)
    out = jnp.zeros((m + 1, cat.shape[1]), dtype=jnp.float32)
    return out.at[dest].set(cat)[:m]


class KmerCounter:
    """Generates overlapping kmer counts for a fasta file on TPU.

    Parameters mirror the reference BasicCounter (seekr/kmer_counts.py:48-101):

    infasta: str (default=None)            path to fasta to count
    outfile: str (default=None)            where to save counts
    k: int (default=6)                     k-mer size
    binary: bool (default=True)            .npy if True else csv
    mean: bool | np.ndarray | str          center columns (str = .npy path)
    std: bool | np.ndarray | str           standardize columns (str = .npy path)
    log2: str (default='Log2.post')        'Log2.pre' | 'Log2.post' | 'Log2.none'
    leave, silent: tqdm controls
    label: bool (default=False)            labeled csv output
    alphabet: str (default='AGTC')         valid letters (column order = product)
    min_bucket_len: int (default=256)      TPU-native extension: floor for the
        power-of-two encode length buckets.  Raising it to the corpus max
        forces a SINGLE bucket — more padded count FLOPs (trivial on the
        MXU) for one stable compiled shape, which is what a latency-bound
        caller (the serving query path) wants: re-mixed length buckets
        otherwise re-tile the assemble scatter every batch.
    """

    def __init__(
        self,
        infasta=None,
        outfile=None,
        k=6,
        binary=True,
        mean=True,
        std=True,
        log2="Log2.post",
        leave=True,
        silent=False,
        label=False,
        alphabet="AGTC",
        min_bucket_len=256,
    ):
        self.infasta = infasta
        self.seqs = None
        self.headers = None
        if infasta is not None:
            reader = Reader(infasta)
            self.seqs = reader.get_seqs()
            # free from the same cached parse; saves downstream callers
            # (barplots, leiden, workflow) a full re-read for labels
            self.headers = reader.get_headers()
        self._file_seqs = self.seqs  # identity-tracked for the fast file path
        # snapshot of the same string objects: `==` is O(m) pointer compares
        # while untouched, and catches IN-PLACE edits (c.seqs[0] = ...) that
        # identity alone would miss — the reference counts mutated seqs
        self._file_seqs_snapshot = list(self.seqs) if self.seqs else None
        self.outfile = outfile
        self.k = int(k)
        self.binary = binary
        self.mean = mean
        if isinstance(mean, str):
            self.mean = np.load(mean)
        self.std = std
        if isinstance(std, str):
            self.std = np.load(std)
        self.log2 = log2
        self.leave = leave
        self.silent = silent
        self.label = label
        self.counts = None
        self.min_bucket_len = int(min_bucket_len)
        self.alphabet = alphabet
        self.alpha_len = len(alphabet)
        self.kmers = kmer_strings(self.k, alphabet)
        self.map = {kmer: i for i, kmer in enumerate(self.kmers)}

        if self.seqs is not None:
            if len(self.seqs) == 1 and self.std is True:
                err = (
                    "You cannot standardize a single sequence. "
                    "Please pass the path to an std. dev. array, "
                    "or use raw counts by setting std=False."
                )
                raise ValueError(err)

        if self.log2 not in ("Log2.pre", "Log2.post", "Log2.none"):
            raise ValueError("log2 must be one of ['Log2.pre', 'Log2.post', 'Log2.none']")

    # -- counting ----------------------------------------------------------

    def occurrences(self, row, seq):
        """Count k-mers of one sequence on a per-kilobase scale into ``row``.

        Kept for API parity with the reference (kmer_counts.py:140-151);
        the bulk path does not call this per sequence.
        """
        counts = count_kmers_host([seq], self.k, self.alphabet)[0]
        hit = np.nonzero(counts > 0)[0]
        if isinstance(row, np.ndarray):
            row[hit] = counts[hit]
        else:
            # the reference assigns into whatever sequence the caller
            # passed (kmer_counts.py:150 mutates a list in place);
            # np.asarray would copy a list and silently drop the writes
            for i in hit:
                row[int(i)] = float(counts[i])
        return row

    def _encode_from_file(self, include_ids=None):
        """Native parse+encode of infasta, guarded against file drift.

        Returns None (caller falls back to encoding ``self.seqs``) when the
        file cannot be read or its record lengths no longer match the
        sequences parsed at construction time — counting must always
        reflect ``self.seqs``, never a later state of the file (the
        reference reads only once).  A same-length in-place content
        rewrite is not detectable without materializing the parse and is
        out of scope.
        """
        try:
            encoded = encode_fasta(
                self.infasta, self.k, self.alphabet,
                min_bucket_len=self.min_bucket_len,
                max_rows_per_bucket=_MAX_ROWS_PER_BUCKET,
                include_ids=include_ids,
            )
        except (OSError, IndexError, ValueError):
            # IndexError/ValueError: include_ids (construction-time row
            # ids) indexed into a file that shrank since — bucket assembly
            # faults before the record-length guard below can run
            return None
        if encoded.n_seqs != len(self.seqs) or not np.array_equal(
                np.asarray(encoded.lengths),
                [len(s) for s in self.seqs]):
            return None
        return encoded

    def _raw_counts(self) -> np.ndarray:
        """Raw counts-per-kb matrix [m, alpha_len**k] float32 (host numpy)."""
        return np.asarray(self._raw_counts_device())

    def _raw_counts_device(self):
        """Raw counts-per-kb matrix [m, alpha_len**k] float32, device-resident.

        The count matrix is assembled ON DEVICE (per-bucket results
        concatenated + scattered into file order) so downstream device
        stages (normalize, Pearson) consume it without a device->host->
        device round trip — at GENCODE scale the [13k, 4096] matrix is
        213 MB, a needless double PCIe hop on real hardware and seconds
        of wall time on a slow link (BASELINE.md round-3 AOT table).
        """
        m = len(self.seqs)
        n_cols = self.alpha_len ** self.k
        if self.alpha_len != 4:
            return jnp.asarray(count_kmers_host(self.seqs, self.k,
                                                self.alphabet))

        # (padded dest row ids, device block) pairs covering all m rows;
        # dest id m marks a pad row (dropped by the assemble scatter)
        parts = []

        long_ids = [i for i, s in enumerate(self.seqs)
                    if len(s) > _LONG_SEQ_THRESHOLD]
        if long_ids:
            # chunked (sequence-parallel) counting for very long transcripts
            from seekr_tpu.io.encode import encode_seq
            from seekr_tpu.ops.count import count_kmers_long

            rows = np.stack([
                count_kmers_long(encode_seq(self.seqs[i], self.alphabet),
                                 self.k)
                for i in long_ids])
            parts.append((np.asarray(long_ids, dtype=np.int32),
                          jnp.asarray(rows)))

        long_set = set(long_ids)
        short_ids = [i for i in range(m) if i not in long_set]
        if short_ids:
            encoded = None
            id_map = None
            file_path_ok = (self.infasta is not None
                            and self.seqs is self._file_seqs
                            and self.seqs == self._file_seqs_snapshot)
            if file_path_ok:
                # native C++ parse + multithreaded batch encode when
                # available; long rows (if any) are excluded but keep
                # file-order row ids
                encoded = self._encode_from_file(
                    include_ids=short_ids if long_ids else None)
            if encoded is None:
                encoded = encode_seqs(
                    [self.seqs[i] for i in short_ids], self.k, self.alphabet,
                    min_bucket_len=self.min_bucket_len,
                    max_rows_per_bucket=_MAX_ROWS_PER_BUCKET,
                )
                id_map = np.asarray(short_ids, dtype=np.int64)

            buckets = encoded.buckets
            if not self.silent:
                buckets = my_tqdm()(buckets, desc="Kmers", leave=self.leave)
            for bases, lengths, row_ids in buckets:
                res = count_kmers_device(bases, lengths, self.k)
                real = row_ids if id_map is None else id_map[row_ids]
                dest = np.full(res.shape[0], m, dtype=np.int32)
                dest[: len(real)] = real
                parts.append((dest, res))

        if not parts:
            return jnp.zeros((m, n_cols), dtype=jnp.float32)
        dest = np.concatenate([p[0] for p in parts])
        if len(parts) == 1 and parts[0][1].shape[0] == m \
                and np.array_equal(dest, np.arange(m)):
            return parts[0][1]  # already whole and in file order
        # one compiled concat+scatter restores file order (buckets group
        # rows by length; pad rows scatter out of range and drop);
        # through the AOT store — scattered eager ops would each pay a
        # fresh remote compile per process
        from seekr_tpu.utils.aot import aot_call

        return aot_call(_assemble_impl,
                        (tuple(p[1] for p in parts), jnp.asarray(dest)),
                        dict(m=m))

    def get_counts_device(self, nan_check: bool = True):
        """Normalized counts as a DEVICE array — no host round trip.

        Same math and warnings as ``get_counts`` (which is this plus one
        final fetch); for callers that feed the matrix straight into more
        device work (find_pval, kmer_leiden, the Pearson stage) so the
        [m, 4^k] matrix never crosses to the host.  ``self.counts`` is
        not populated — call ``get_counts`` for the host-numpy contract.

        ``nan_check=False`` skips the NaN warning probe — the probe is a
        blocking scalar fetch (a full pipeline sync), which latency-bound
        repeated callers (the serving query path) cannot afford per call.

        Note: this routes through ``_raw_counts_device``; a subclass
        overriding only ``_raw_counts`` should override this too.
        """
        with stage_timer("kmer_counts", items=len(self.seqs or ()),
                         unit="transcripts"):
            raw = self._raw_counts_device()
        counts, mean, std = normalize_counts(
            raw, log2_mode=self.log2, mean=self.mean, std=self.std,
        )
        if self.mean is True and mean is not None:
            self.mean = np.asarray(mean)
        if self.std is True and std is not None:
            self.std = np.asarray(std)
        if nan_check and self.std is not False and _has_nan(counts):
            print(
                "\nWARNING: You have `np.nan` values in your counts "
                "after standardization. This is likely due to "
                "a kmer not appearing in any of your sequences. "
                "Try: \n1) using a smaller kmer size, \n2) beginning "
                "with a larger set of sequences, \n3) passing "
                "precomputed normalization vectors from a larger "
                "data set (e.g. GENCODE)."
            )
        return counts

    def get_counts(self):
        """Generate the (normalized) count matrix for the fasta file."""
        self.counts = np.asarray(self.get_counts_device())
        return self.counts

    # -- persistence --------------------------------------------------------

    def save(self, names=None):
        """Save counts: binary .npy | labeled csv | raw %1.6f csv.

        Mirrors reference kmer_counts.py:211-241 byte-for-byte (including the
        '>'-prefixed fasta headers as csv row labels).
        """
        err_msg = (
            "You cannot label a binary file. "
            'Set only one of "binary" or "label" as True. '
            "If you used `-b` from the command line, "
            "try also using `-rl`."
        )
        assert not (self.binary and self.label), err_msg
        assert self.outfile is not None, "Please provide an outfile location."
        if self.binary:
            np.save(self.outfile, self.counts)
        elif self.label:
            if names is None:
                names = self.headers
            from seekr_tpu.io.fast_csv import write_labeled_csv

            write_labeled_csv(self.outfile, self.counts, names, self.kmers)
        else:
            from seekr_tpu.io.fast_csv import write_raw_csv

            write_raw_csv(self.outfile, self.counts)

    def make_count_file(self, names=None):
        """get_counts + save (if outfile set); returns the counts matrix."""
        self.get_counts()
        if self.outfile is not None:
            self.save(names)
        return self.counts


# Reference-compatible aliases
BasicCounter = KmerCounter


def make_count_file(infasta, outfile, k=6, **kwargs):
    return KmerCounter(infasta=infasta, outfile=outfile, k=k, **kwargs).make_count_file()
