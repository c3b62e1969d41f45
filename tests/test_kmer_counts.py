"""Unit tests for the counting engine.

Hand-computed expectations mirror the reference's own test style
(tests/test_kmer_counts.py in the upstream repo): counts are per kilobase of
windows, column order is itertools.product('AGTC', k).
"""

import numpy as np
import pytest

from seekr_tpu import KmerCounter
from seekr_tpu.io.encode import encode_seqs, kmer_strings
from seekr_tpu.ops.count import count_kmers_device, count_kmers_host
from seekr_tpu.ops.normalize import normalize_counts


class TestCounting:
    def test_kmer_order_agtc(self):
        kmers = kmer_strings(2)
        assert kmers[:4] == ["AA", "AG", "AT", "AC"]
        assert kmers[-1] == "CC"

    def test_occurrences_k1_homopolymer(self):
        # "AAAAAA": 6 windows of A -> 1000/kb in column A
        out = count_kmers_host(["AAAAAA"], 1)
        expected = np.zeros(4)
        expected[0] = 1000
        assert np.allclose(out[0], expected)

    def test_occurrences_k1_half(self):
        # "TTTTTTGGGGGG": 6 T + 6 G of 12 windows
        out = count_kmers_host(["TTTTTTGGGGGG"], 1)
        expected = np.zeros(4)
        expected[1] = 500  # G
        expected[2] = 500  # T
        assert np.allclose(out[0], expected)

    def test_occurrences_k2(self):
        # "TTTTTTGGGGGG" k=2: TT x5, TG x1, GG x5 over 11 windows
        out = count_kmers_host(["TTTTTTGGGGGG"], 2)
        expected = np.zeros(16)
        expected[10] = 5 * 1000 / 11  # TT (T=2 -> 2*4+2)
        expected[9] = 1000 / 11       # TG (2*4+1)
        expected[5] = 5 * 1000 / 11   # GG (1*4+1)
        assert np.allclose(out[0], expected, rtol=1e-5)

    def test_n_bases_skipped_denominator_kept(self):
        # "ANAA" k=2: windows AN, NA, AA -> only AA counts; denominator 3
        out = count_kmers_host(["ANAA"], 2)
        expected = np.zeros(16)
        expected[0] = 1000 / 3
        assert np.allclose(out[0], expected)

    def test_short_sequence_zero_row(self):
        out = count_kmers_host(["AG"], 6)
        assert out.shape == (1, 4096)
        assert np.all(out == 0)

    def test_device_matches_host(self):
        rng = np.random.default_rng(42)
        seqs = [
            "".join(rng.choice(list("AGTCN"), size=n, p=[0.24, 0.24, 0.24, 0.24, 0.04]))
            for n in [6, 13, 77, 301, 4097]
        ]
        for k in (1, 2, 4, 6):
            host = count_kmers_host(seqs, k)
            enc = encode_seqs(seqs, k)
            dev = np.zeros_like(host)
            for bases, lengths, rows in enc.buckets:
                res = np.asarray(count_kmers_device(bases, lengths, k))
                dev[rows] = res[: len(rows)]
            assert np.allclose(host, dev, rtol=1e-5, atol=1e-4), f"k={k}"

    def test_forced_pallas_out_of_range_k_falls_back(self, monkeypatch):
        # SEEKR_TPU_COUNT_IMPL=pallas with k outside the kernel's [2, 8]
        # must fall back to the XLA path, not crash (round-2 review fix)
        monkeypatch.setenv("SEEKR_TPU_COUNT_IMPL", "pallas")
        seqs = ["AGTCAGTCAGTC", "TTTTGGGG"]
        for k in (1, 9):
            host = count_kmers_host(seqs, k)
            enc = encode_seqs(seqs, k)
            for bases, lengths, rows in enc.buckets:
                res = np.asarray(count_kmers_device(bases, lengths, k))
                assert np.allclose(host[rows], res[: len(rows)],
                                   rtol=1e-5, atol=1e-4), f"k={k}"

    def test_custom_alphabet(self):
        # 2-letter alphabet: columns in product('AT', 2) order: AA AT TA TT
        out = count_kmers_host(["AATT"], 2, alphabet="AT")
        assert np.allclose(out[0], [1000 / 3, 1000 / 3, 0, 1000 / 3])


class TestNormalize:
    def test_center_vector(self):
        counts = np.array([[1, 2, 3, 4], [1, -2, 5, 10]], dtype=np.float32)
        mean = np.ones(4, dtype=np.float32)
        mean[3] = -1
        out, _, _ = normalize_counts(counts, log2_mode="Log2.none", mean=mean, std=False)
        expected = np.array([[0, 1, 2, 5], [0, -3, 4, 11]], dtype=np.float32)
        assert np.allclose(np.asarray(out), expected)

    def test_standardize_vector(self):
        counts = np.array([[1, 2, 3, 4], [0, -2, 5, 10]], dtype=np.float32)
        std = np.arange(1, 5, dtype=np.float32)
        out, _, _ = normalize_counts(counts, log2_mode="Log2.none", mean=False, std=std)
        expected = np.array([[1, 1, 1, 1], [0, -1, 5 / 3, 2.5]], dtype=np.float32)
        assert np.allclose(np.asarray(out), expected)

    def test_mean_std_computed(self):
        rng = np.random.default_rng(0)
        counts = rng.uniform(0, 100, (7, 16)).astype(np.float32)
        out, mean, std = normalize_counts(counts, log2_mode="Log2.none", mean=True, std=True)
        assert np.allclose(np.asarray(mean), counts.mean(axis=0), rtol=1e-6)
        centered = counts - counts.mean(axis=0)
        assert np.allclose(np.asarray(std), centered.std(axis=0), rtol=1e-5)
        assert np.allclose(np.asarray(out), centered / centered.std(axis=0), rtol=1e-4, atol=1e-5)

    def test_log2_post_matches_numpy(self):
        rng = np.random.default_rng(1)
        counts = rng.uniform(0, 50, (9, 16)).astype(np.float32)
        out, _, _ = normalize_counts(counts, log2_mode="Log2.post", mean=True, std=True)
        c = counts - counts.mean(axis=0)
        c /= c.std(axis=0)
        c += np.abs(c.min())
        c = np.log2(c + 1)
        assert np.allclose(np.asarray(out), c, rtol=1e-4, atol=1e-5)

    def test_log2_pre(self):
        counts = np.array([[0.0, 3.0], [1.0, 7.0]], dtype=np.float32)
        out, _, _ = normalize_counts(counts, log2_mode="Log2.pre", mean=False, std=False)
        assert np.allclose(np.asarray(out), np.log2(counts + 1), rtol=1e-6)

    def test_bad_log2_raises(self):
        with pytest.raises(ValueError):
            normalize_counts(np.zeros((2, 4), np.float32), log2_mode="log2.post")


class TestKmerCounter:
    def test_single_seq_std_raises(self, tmp_path):
        fa = tmp_path / "one.fa"
        fa.write_text(">a\nAAGGTTCC\n")
        with pytest.raises(ValueError):
            KmerCounter(str(fa), k=2)

    def test_bad_log2_raises(self, tmp_path):
        fa = tmp_path / "two.fa"
        fa.write_text(">a\nAAGG\n>b\nTTCC\n")
        with pytest.raises(ValueError):
            KmerCounter(str(fa), k=2, log2="nope")

    def test_raw_counts_match_occurrences(self, example_fa):
        counter = KmerCounter(example_fa, k=2, mean=False, std=False, log2="Log2.none", silent=True)
        counter.get_counts()
        expected = np.zeros((5, 16), dtype=np.float32)
        for i, seq in enumerate(counter.seqs):
            expected[i] = counter.occurrences(expected[i], seq)
        assert np.allclose(counter.counts, expected, rtol=1e-5, atol=1e-4)

    def test_mean_std_attributes_set(self, example_fa):
        counter = KmerCounter(example_fa, k=2, silent=True)
        counter.get_counts()
        assert counter.mean.shape == (16,)
        assert counter.std.shape == (16,)

    def test_save_binary(self, example_fa, tmp_path):
        out = str(tmp_path / "c.npy")
        counter = KmerCounter(example_fa, outfile=out, k=2, silent=True)
        counts = counter.make_count_file()
        assert np.allclose(np.load(out), counts)

    def test_save_labeled_csv(self, example_fa, tmp_path):
        import pandas as pd

        out = str(tmp_path / "c.csv")
        counter = KmerCounter(example_fa, outfile=out, k=2, binary=False, label=True, silent=True)
        counter.make_count_file()
        df = pd.read_csv(out, index_col=0)
        assert list(df.columns) == kmer_strings(2)
        assert list(df.index) == [">SEQ1", ">SEQ2", ">SEQ3", ">SEQ4", ">SEQ5"]

    def test_save_binary_and_label_asserts(self, example_fa, tmp_path):
        counter = KmerCounter(example_fa, outfile=str(tmp_path / "x"), k=2,
                              binary=True, label=True, silent=True)
        counter.get_counts()
        with pytest.raises(AssertionError):
            counter.save()


def test_inplace_seqs_mutation_is_counted(ref_data):
    # reference BasicCounter counts whatever is in .seqs, even after
    # in-place edits; the native fast-file path must not shortcut that
    from seekr_tpu import KmerCounter

    fa = str(ref_data / "example.fa")
    c = KmerCounter(fa, k=1, mean=False, std=False, log2="Log2.none",
                    silent=True)
    c.seqs[0] = "AAAA"
    c.get_counts()
    expected = np.zeros(4)
    expected[0] = 1000.0
    np.testing.assert_allclose(c.counts[0], expected)


def test_lowercase_windows_skipped_like_reference():
    # the reference's k-mer map has uppercase keys only: lowercase
    # (soft-masked) windows are skipped, denominator kept
    from seekr_tpu import KmerCounter

    c = KmerCounter(k=1, mean=False, std=False, log2="Log2.none", silent=True)
    c.seqs = ["AAaa"]
    c.get_counts()
    expected = np.zeros(4)
    expected[0] = 2 * 1000 / 4  # two valid 'A' windows of 4 total
    np.testing.assert_allclose(c.counts[0], expected)


def test_nonagtc_alphabet_long_sequence_columns(tmp_path):
    # long sequences must encode with the counter's alphabet, not AGTC
    # (digit order differs -> silent column permutation before the fix)
    from seekr_tpu import KmerCounter
    from seekr_tpu.models import counter as counter_mod

    fa = tmp_path / "long.fa"
    seq = "ACGT" * 30  # len 120 > patched threshold below
    fa.write_text(f">a\n{seq}\n>b\nACGTACGT\n")
    orig = counter_mod._LONG_SEQ_THRESHOLD
    counter_mod._LONG_SEQ_THRESHOLD = 100
    try:
        c = KmerCounter(str(fa), k=2, mean=False, std=False,
                        log2="Log2.none", alphabet="ACGT", silent=True)
        c.get_counts()
    finally:
        counter_mod._LONG_SEQ_THRESHOLD = orig
    from seekr_tpu.ops.count import count_kmers_host

    expected = count_kmers_host([seq, "ACGTACGT"], 2, alphabet="ACGT")
    np.testing.assert_allclose(c.counts, expected, rtol=1e-5, atol=1e-4)


def test_counts_reflect_init_seqs_not_changed_file(tmp_path):
    # the reference reads the fasta once at __init__; rewriting (or
    # deleting) the file afterwards must not change what gets counted.
    # The guard compares record lengths; a same-length content rewrite is
    # documented as out of scope (_encode_from_file docstring).
    from seekr_tpu import KmerCounter
    from seekr_tpu.ops.count import count_kmers_host

    fa = tmp_path / "x.fa"
    fa.write_text(">a\nAAAA\n>b\nTTTT\n")
    c = KmerCounter(str(fa), k=1, mean=False, std=False, log2="Log2.none",
                    silent=True)
    fa.write_text(">a\nGG\n>b\nCCCCCC\n>c\nAA\n")  # different shape
    c.get_counts()
    np.testing.assert_allclose(c.counts,
                               count_kmers_host(["AAAA", "TTTT"], 1))

    fa2 = tmp_path / "gone.fa"
    fa2.write_text(">a\nAAAA\n")
    import os

    c2 = KmerCounter(str(fa2), k=1, mean=False, std=False,
                     log2="Log2.none", silent=True)
    os.unlink(str(fa2))  # deleted after init: counts still work
    c2.get_counts()
    np.testing.assert_allclose(c2.counts, count_kmers_host(["AAAA"], 1))


def test_counts_survive_file_shrink_with_long_seqs(tmp_path):
    # the include_ids fast path re-reads the file with construction-time
    # row ids; a file that SHRANK used to fault inside bucket assembly
    # (IndexError) before the length guard could trigger the documented
    # fallback to counting self.seqs
    from seekr_tpu import KmerCounter
    from seekr_tpu.models import counter as counter_mod
    from seekr_tpu.ops.count import count_kmers_host

    long_seq = "AGTC" * 60
    fa = tmp_path / "shrink.fa"
    fa.write_text(f">long\n{long_seq}\n>s1\nAAAATTTT\n>s2\nGGGGCCCC\n")
    orig = counter_mod._LONG_SEQ_THRESHOLD
    counter_mod._LONG_SEQ_THRESHOLD = 100
    try:
        c = KmerCounter(str(fa), k=2, mean=False, std=False,
                        log2="Log2.none", silent=True)
        fa.write_text(">only\nAA\n")  # shrink AFTER construction
        c.get_counts()
    finally:
        counter_mod._LONG_SEQ_THRESHOLD = orig
    expected = count_kmers_host([long_seq, "AAAATTTT", "GGGGCCCC"], 2)
    np.testing.assert_allclose(c.counts, expected, rtol=1e-5, atol=1e-4)


def test_long_plus_short_mixed_file(tmp_path):
    from seekr_tpu import KmerCounter
    from seekr_tpu.models import counter as counter_mod
    from seekr_tpu.ops.count import count_kmers_host

    rng = np.random.default_rng(0)
    letters = np.array(list("AGTC"))
    long_seq = "".join(letters[rng.integers(0, 4, 300)])
    shorts = ["".join(letters[rng.integers(0, 4, n)]) for n in (20, 37, 64)]
    fa = tmp_path / "mix.fa"
    fa.write_text(f">L\n{long_seq}\n" +
                  "".join(f">s{i}\n{s}\n" for i, s in enumerate(shorts)))
    orig = counter_mod._LONG_SEQ_THRESHOLD
    counter_mod._LONG_SEQ_THRESHOLD = 200
    try:
        c = KmerCounter(str(fa), k=3, mean=False, std=False,
                        log2="Log2.none", silent=True)
        c.get_counts()
    finally:
        counter_mod._LONG_SEQ_THRESHOLD = orig
    expected = count_kmers_host([long_seq] + shorts, 3)
    np.testing.assert_allclose(c.counts, expected, rtol=1e-5, atol=1e-4)


def test_get_counts_device_equals_host_path(example_fa, tmp_path):
    # the device-resident path (round 3) must be BIT-identical to
    # get_counts across normalization modes — find_pval/kmer_leiden/
    # find_dist/serve all consume it now
    import jax.numpy as jnp

    from seekr_tpu import KmerCounter

    for kwargs in (
        dict(mean=False, std=False, log2="Log2.none"),
        dict(mean=True, std=True, log2="Log2.post"),
        dict(mean=True, std=True, log2="Log2.pre"),
    ):
        host = KmerCounter(example_fa, k=2, silent=True, **kwargs)
        host.get_counts()
        dev = KmerCounter(example_fa, k=2, silent=True, **kwargs)
        out = dev.get_counts_device()
        assert isinstance(out, jnp.ndarray)
        np.testing.assert_array_equal(np.asarray(out), host.counts)
        # computed norm vectors land on the counter in both paths
        if kwargs["mean"] is True:
            np.testing.assert_array_equal(np.asarray(dev.mean),
                                          np.asarray(host.mean))
            np.testing.assert_array_equal(np.asarray(dev.std),
                                          np.asarray(host.std))
        # get_counts_device does NOT populate the host .counts contract
        assert dev.counts is None


def test_device_path_mixed_long_short_scatter(tmp_path):
    # the compiled assemble graph (trim+concat+scatter) must restore file
    # order when long-seq rows and multiple length buckets interleave
    from seekr_tpu import KmerCounter
    from seekr_tpu.models import counter as counter_mod
    from seekr_tpu.ops.count import count_kmers_host

    rng = np.random.default_rng(7)
    letters = np.array(list("AGTC"))
    seqs = []
    for i, n in enumerate((250, 20, 300, 64, 37, 310, 24)):
        seqs.append("".join(letters[rng.integers(0, 4, n)]))
    fa = tmp_path / "mix.fa"
    fa.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
    orig = counter_mod._LONG_SEQ_THRESHOLD
    counter_mod._LONG_SEQ_THRESHOLD = 200
    try:
        c = KmerCounter(str(fa), k=3, mean=False, std=False,
                        log2="Log2.none", silent=True)
        got = np.asarray(c._raw_counts_device())
    finally:
        counter_mod._LONG_SEQ_THRESHOLD = orig
    expected = count_kmers_host(seqs, 3)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def test_normalize_segmented_bitwise_per_block():
    # request coalescing (serve.py) rests on this: each segment of one
    # merged matrix must be BITWISE what the plain epilogue gives that
    # segment alone — min-of-row-mins is exactly the global min, and
    # everything else is row-local (all 3 log2 modes)
    from seekr_tpu.ops.normalize import (normalize_counts,
                                         normalize_counts_segmented)

    rng = np.random.default_rng(0)
    m, n = 11, 64
    counts = rng.uniform(0, 50, (m, n)).astype(np.float32)
    mean = rng.uniform(0, 2, n)
    std = rng.uniform(0.5, 2, n)
    sizes = [3, 1, 5, 2]
    seg_ids = np.repeat(np.arange(4), sizes)
    for mode in ("Log2.post", "Log2.pre", "Log2.none"):
        seg = np.asarray(normalize_counts_segmented(
            counts, seg_ids, 8, log2_mode=mode, mean=mean, std=std))
        off = 0
        for s in sizes:
            blk, _, _ = normalize_counts(counts[off:off + s],
                                         log2_mode=mode, mean=mean, std=std)
            np.testing.assert_array_equal(seg[off:off + s], np.asarray(blk),
                                          err_msg=f"{mode} block at {off}")
            off += s
    # computed/skipped stats are a corpus concern, not a serving one
    import pytest

    with pytest.raises(ValueError, match="provided"):
        normalize_counts_segmented(counts, seg_ids, 8, mean=True, std=std)


def test_occurrences_mutates_list_like_reference():
    """The reference assigns into whatever sequence the caller passes
    (kmer_counts.py:150 mutates a list in place); np.asarray would copy
    a list and silently drop the writes (review finding)."""
    from seekr_tpu.models.counter import KmerCounter

    counter = KmerCounter(None, k=1, silent=True)
    row = [0.0, 0.0, 0.0, 0.0]
    out = counter.occurrences(row, "AATG")
    assert out is row
    assert row[0] == pytest.approx(500.0)   # A: 2 of 4 windows * 1000
    assert row[1] == pytest.approx(250.0)   # G
    assert row[2] == pytest.approx(250.0)   # T
    assert row[3] == 0.0                    # C absent


def test_assemble_shape_stable_across_length_mixes():
    """The assemble scatter keys on PADDED bucket shapes + m, never the
    exact per-bucket keep counts: a re-mixed batch with the same padded
    shapes must reuse the warm executable (the serving path pays a fresh
    backend compile per novel keep split otherwise — BASELINE.md round-5
    serve-jitter note), and the pad rows it scatters must be dropped.
    """
    from seekr_tpu.models.counter import _assemble_impl

    rng = np.random.default_rng(7)
    letters = np.array(list("AGTC"))

    def corpus(n_short, n_long):
        # two buckets (lpad 256 floor and 512); both row counts pad to
        # the same powers of two across the splits below
        seqs = (["".join(letters[rng.integers(0, 4, rng.integers(60, 200))])
                 for _ in range(n_short)]
                + ["".join(letters[rng.integers(0, 4,
                                                rng.integers(280, 500))])
                   for _ in range(n_long)])
        order = rng.permutation(len(seqs))
        return [seqs[i] for i in order]

    def device_counts(seqs):
        c = KmerCounter(None, k=2, mean=False, std=False, log2="Log2.none",
                        silent=True)
        c.seqs = list(seqs)
        return np.asarray(c._raw_counts_device())

    cache_size = getattr(_assemble_impl, "_cache_size", None)
    sizes = []
    # keeps (5,11) / (6,12) / (7,15) all pad to rows (8, 16); m pads the
    # batch externally in serve, so pin m by keeping totals equal via
    # padding the shorter corpora with extra short rows
    for n_short, n_long in ((5, 11), (6, 10), (7, 9)):
        seqs = corpus(n_short, n_long)
        got = device_counts(seqs)
        np.testing.assert_allclose(got, count_kmers_host(seqs, 2),
                                   rtol=1e-5, atol=1e-3)
        if cache_size is not None:
            sizes.append(cache_size())
    if sizes:
        # the first mix compiles; the re-mixes (same padded shapes,
        # different keeps) must not
        assert sizes[-1] == sizes[0], sizes


def test_assemble_pad_rows_dropped_odd_m():
    """Row-padded buckets (m not a power of two) scatter their pad rows
    out of range; file order is restored exactly."""
    rng = np.random.default_rng(11)
    letters = np.array(list("AGTC"))
    seqs = ["".join(letters[rng.integers(0, 4, rng.integers(60, 500))])
            for _ in range(13)]  # odd m, mixed buckets, rows pad 8/16
    c = KmerCounter(None, k=3, mean=False, std=False, log2="Log2.none",
                    silent=True)
    c.seqs = list(seqs)
    got = np.asarray(c._raw_counts_device())
    assert got.shape == (13, 64)
    np.testing.assert_allclose(got, count_kmers_host(seqs, 3),
                               rtol=1e-5, atol=1e-3)


def test_assemble_tiny_m_bucket_padded():
    """m=2 with a 256-column bucket and six pad rows is the exact shape
    where TPU scatter with out-of-range mode="drop" pads silently lost
    row 0's update (fuzz seeds 32/33).  The assemble now scatters pads
    to an in-range trash row; pin the shape on every backend."""
    rng = np.random.default_rng(32)
    letters = np.array(list("AGTC"))
    seqs = ["".join(letters[rng.integers(0, 4, n)]) for n in (137, 75)]
    c = KmerCounter(None, k=4, mean=False, std=False, log2="Log2.none",
                    silent=True)
    c.seqs = list(seqs)
    got = np.asarray(c._raw_counts_device())
    host = count_kmers_host(seqs, 4)
    assert host[0].sum() > 0  # the row the miscompile zeroed
    np.testing.assert_allclose(got, host, rtol=1e-5, atol=1e-3)
