"""Pallas k-mer histogram kernel vs the XLA path and the host oracle.

Runs in interpreter mode on the CPU test mesh; on real TPU the same kernel
compiles via Mosaic (exercised by bench.py and __graft_entry__ runs).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from seekr_tpu.ops.count import _count_impl, count_kmers_host
from seekr_tpu.ops.count_pallas import count_kmers_pallas

DIGIT2CHAR = np.array(list("AGTCN"))


def random_case(rng, m, L, k, with_invalid=True):
    hi = 5 if with_invalid else 4
    bases = rng.integers(0, hi, size=(m, L), dtype=np.int8)
    lengths = rng.integers(k, L + 1, size=m).astype(np.int32)
    for r in range(m):
        bases[r, lengths[r]:] = 4
    return bases, lengths


@pytest.mark.parametrize("k", [1, 2, 3, 4, 6])
def test_matches_xla_path(k):
    rng = np.random.default_rng(k)
    bases, lengths = random_case(rng, 9, 515, k)
    ref = np.asarray(_count_impl(jnp.asarray(bases), jnp.asarray(lengths), k))
    got = np.asarray(count_kmers_pallas(jnp.asarray(bases),
                                        jnp.asarray(lengths), k,
                                        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_matches_host_oracle_strings():
    k = 3
    rng = np.random.default_rng(0)
    bases, lengths = random_case(rng, 6, 300, k, with_invalid=True)
    seqs = ["".join(DIGIT2CHAR[row[:n]]) for row, n in zip(bases, lengths)]
    oracle = count_kmers_host(seqs, k)
    got = np.asarray(count_kmers_pallas(jnp.asarray(bases),
                                        jnp.asarray(lengths), k,
                                        interpret=True))
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-4)


def test_multi_chunk_rows():
    # length > chunk width forces the inner chunk loop to accumulate
    k = 6
    rng = np.random.default_rng(1)
    bases, lengths = random_case(rng, 8, 5000, k)
    ref = np.asarray(_count_impl(jnp.asarray(bases), jnp.asarray(lengths), k))
    got = np.asarray(count_kmers_pallas(jnp.asarray(bases),
                                        jnp.asarray(lengths), k,
                                        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_row_padding_and_short_rows():
    # m not a multiple of the row tile; one row shorter than k -> zero row
    k = 4
    rng = np.random.default_rng(2)
    bases, lengths = random_case(rng, 11, 260, k)
    lengths[3] = k - 1  # fewer than one window
    bases[3, :] = 4
    got = np.asarray(count_kmers_pallas(jnp.asarray(bases),
                                        jnp.asarray(lengths), k,
                                        interpret=True))
    assert got.shape == (11, 4 ** k)
    np.testing.assert_array_equal(got[3], 0.0)
