"""Property tests for k-mer counting (invariants the goldens can't cover).

SURVEY.md section 4: "add what the reference lacks ... property tests
(shift/concat invariants of counts)".
"""

import numpy as np
import pytest

import jax.numpy as jnp

from seekr_tpu.ops.count import _count_impl, count_kmers_host

BASES = "AGTC"


def rand_seq(rng, n, alphabet=BASES):
    return "".join(rng.choice(list(alphabet), size=n))


def device_counts(seqs, k):
    lengths = np.array([len(s) for s in seqs], np.int32)
    lpad = max(lengths.max(), k)
    lut = {c: i for i, c in enumerate(BASES)}
    bases = np.full((len(seqs), lpad), 4, np.int8)
    for r, s in enumerate(seqs):
        bases[r, :len(s)] = [lut.get(c, 4) for c in s]
    return np.asarray(_count_impl(jnp.asarray(bases), jnp.asarray(lengths), k))


def test_total_windows_conservation():
    """Sum of unscaled counts * (len-k+1)/1000 equals the valid window count."""
    rng = np.random.default_rng(0)
    k = 4
    seqs = [rand_seq(rng, n) for n in (50, 173, 999)]
    counts = device_counts(seqs, k)
    for row, s in zip(counts, seqs):
        n_windows = len(s) - k + 1
        total = row.sum() * n_windows / 1000.0
        assert abs(total - n_windows) < 1e-2


def test_invalid_bases_reduce_total_but_not_denominator():
    k = 3
    seq = "AGTCAGTCAGTC"
    seq_with_n = "AGTCNGTCAGTC"  # one N kills 3 windows
    c1 = count_kmers_host([seq], k)[0]
    c2 = count_kmers_host([seq_with_n], k)[0]
    w = len(seq) - k + 1
    assert abs(c1.sum() * w / 1000 - w) < 1e-3
    assert abs(c2.sum() * w / 1000 - (w - 3)) < 1e-3


def test_concat_superposition():
    """counts(a+b) * w_ab = counts(a)*w_a + counts(b)*w_b + boundary windows."""
    rng = np.random.default_rng(1)
    k = 3
    a, b = rand_seq(rng, 200), rand_seq(rng, 300)
    ca = count_kmers_host([a], k)[0] * (len(a) - k + 1) / 1000
    cb = count_kmers_host([b], k)[0] * (len(b) - k + 1) / 1000
    cab = count_kmers_host([a + b], k)[0] * (len(a) + len(b) - k + 1) / 1000
    boundary = count_kmers_host([a[-(k - 1):] + b[:k - 1]], k)[0] * (k - 1) / 1000
    np.testing.assert_allclose(cab, ca + cb + boundary, atol=1e-3)


def test_order_permutation_invariance():
    """Shuffling sequence order permutes rows identically."""
    rng = np.random.default_rng(2)
    k = 2
    seqs = [rand_seq(rng, n) for n in (40, 80, 120, 250)]
    perm = [2, 0, 3, 1]
    c = device_counts(seqs, k)
    cp = device_counts([seqs[i] for i in perm], k)
    np.testing.assert_allclose(cp, c[perm], rtol=1e-6)


def test_single_base_sequence_composition():
    """Homopolymer has all windows in one bin."""
    k = 5
    c = count_kmers_host(["A" * 100], k)[0]
    assert c[0] == pytest.approx(1000.0, abs=1e-3)  # AAAAA is column 0
    assert np.count_nonzero(c) == 1


def test_reverse_is_not_identity_but_preserves_total():
    rng = np.random.default_rng(3)
    k = 3
    s = rand_seq(rng, 500)
    c = count_kmers_host([s], k)[0]
    cr = count_kmers_host([s[::-1]], k)[0]
    assert c.sum() == pytest.approx(cr.sum(), rel=1e-6)


def test_device_vs_host_fuzz():
    rng = np.random.default_rng(4)
    for trial in range(5):
        k = int(rng.integers(1, 7))
        seqs = [rand_seq(rng, int(n), BASES + "N")
                for n in rng.integers(k + 1, 400, size=6)]
        host = count_kmers_host(seqs, k)
        dev = device_counts(seqs, k)
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [7, 8])
def test_large_k_device_counts(k):
    """k=7/8 (16k/65k columns) exercise the asymmetric hi/lo split."""
    rng = np.random.default_rng(k)
    seqs = [rand_seq(rng, 300), rand_seq(rng, 550)]
    host = count_kmers_host(seqs, k)
    dev = device_counts(seqs, k)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)
    assert dev.shape == (2, 4 ** k)


def test_count_kmers_long_matches_whole():
    from seekr_tpu.ops.count import count_kmers_long
    from seekr_tpu.io.encode import encode_seq

    rng = np.random.default_rng(9)
    seq = rand_seq(rng, 50_000, BASES + "N")
    k = 6
    whole = count_kmers_host([seq], k)[0]
    chunked = count_kmers_long(encode_seq(seq), k, target_chunk=4096)
    np.testing.assert_allclose(chunked, whole, rtol=1e-4, atol=1e-3)


def test_counter_long_sequence_path():
    """KmerCounter routes >16kb transcripts through chunked counting."""
    from seekr_tpu.models.counter import KmerCounter

    rng = np.random.default_rng(10)
    seqs = [rand_seq(rng, 20_000), rand_seq(rng, 300), rand_seq(rng, 18_000),
            rand_seq(rng, 700)]
    counter = KmerCounter(k=3, mean=False, std=False, log2="Log2.none",
                          silent=True)
    counter.seqs = seqs
    got = counter.get_counts()
    oracle = count_kmers_host(seqs, 3)
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("k", [2, 4, 6, 7, 8])
def test_flat_false_bytes_are_flat_counts(k):
    """count_graph(flat=False) returns a 3-D tensor whose row-major host
    reshape equals the flat [m, 4^k] output exactly — the contract the
    KmerCounter fetch path and the fused pipeline rely on to skip the
    device-side relayout copy (BASELINE.md flatten-relayout discovery)."""
    import jax

    from seekr_tpu.ops.count import _count_impl, count_kmers_device
    from seekr_tpu.ops.count_pallas import count_kmers_pallas

    rng = np.random.default_rng(k)
    m, L = 70, 260
    bases = rng.integers(0, 5, size=(m, L)).astype(np.int8)
    lengths = rng.integers(1, L, size=m).astype(np.int32)

    flat = np.asarray(_count_impl(jnp.asarray(bases), jnp.asarray(lengths),
                                  k))
    three = np.asarray(_count_impl(jnp.asarray(bases),
                                   jnp.asarray(lengths), k, flat=False))
    assert three.ndim == 3
    assert np.array_equal(three.reshape(m, -1), flat)

    p3 = np.asarray(count_kmers_pallas(
        jnp.asarray(bases), jnp.asarray(lengths), k,
        interpret=jax.default_backend() != "tpu", flat=False))
    pf = np.asarray(count_kmers_pallas(
        jnp.asarray(bases), jnp.asarray(lengths), k,
        interpret=jax.default_backend() != "tpu"))
    assert np.array_equal(p3.reshape(p3.shape[0], -1)[:m], pf)

    disp = np.asarray(count_kmers_device(bases, lengths, k, flat=False))
    assert np.array_equal(disp.reshape(m, -1), flat)


@pytest.mark.parametrize("k", [1, 11])
def test_out_of_kernel_range_k_full_counter_path(k, tmp_path):
    """VERDICT r3 item 7: pin the k range OUTSIDE the Pallas kernel's
    [2, 10] — k=1 (4 columns) and k=11 (4^11 = 4,194,304 columns) must
    produce oracle-correct counts through the FULL KmerCounter path
    (the reference accepts any k, seekr/kmer_counts.py:100,121; here
    _impl_choice falls back to the XLA scan outside the kernel range).
    """
    from seekr_tpu.models.counter import KmerCounter
    from seekr_tpu.ops.count import _impl_choice

    assert _impl_choice(k) == "xla"
    rng = np.random.default_rng(k)
    seqs = [rand_seq(rng, 80), rand_seq(rng, 201),
            rand_seq(rng, 40, alphabet=BASES + "N")]  # invalid bases too
    fa = tmp_path / "kb.fa"
    fa.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))

    counter = KmerCounter(str(fa), k=k, log2="Log2.none", mean=False,
                          std=False, silent=True)
    got = counter.get_counts()
    assert got.shape == (3, 4 ** k)

    oracle = count_kmers_host(seqs, k)
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-4)

    # independent micro-oracle (reference occurrences semantics,
    # seekr/kmer_counts.py:144-150, written out longhand): every valid
    # window adds 1000/(len-k+1) to its k-mer column, AGTC digit order
    order = {c: i for i, c in enumerate("AGTC")}
    for row, s in zip(got, seqs):
        expect = np.zeros(4 ** k, np.float64)
        denom = len(s) - k + 1
        for i in range(denom):
            w = s[i:i + k]
            if any(c not in order for c in w):
                continue
            code = 0
            for c in w:
                code = code * 4 + order[c]
            expect[code] += 1000.0 / denom
        np.testing.assert_allclose(row, expect, rtol=1e-4, atol=1e-3)


def test_native_gate_memo_invalidates_on_file_change(tmp_path):
    """The gate verdict is memoized per (path, size, mtime): a rewrite
    that flips the verdict (e.g. introducing a CR byte) must be
    re-scanned, never served stale."""
    from seekr_tpu.io.encode import _native_parse_is_safe

    fa = tmp_path / "memo.fa"
    fa.write_text(">h\nACGT\n")
    assert _native_parse_is_safe(str(fa)) is True
    assert _native_parse_is_safe(str(fa)) is True  # cached
    fa.write_text(">h\r\nACGT\r\n")  # CRLF: native must be rejected
    import os
    os.utime(fa, (1, 1))  # force a distinct stat key even on coarse mtime
    assert _native_parse_is_safe(str(fa)) is False
