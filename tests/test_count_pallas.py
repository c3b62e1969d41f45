"""Pallas k-mer histogram kernel vs the XLA path and the host oracle.

On the CPU test mesh the kernel runs in interpreter mode; under
SEEKR_TPU_TEST_BACKEND=tpu the SAME assertions run against the compiled
Mosaic kernel on hardware (interpret=False), so compiled-mode semantics are
assertion-tested, not just benchmarked.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seekr_tpu.ops.count import _count_impl, count_kmers_host
from seekr_tpu.ops.count_pallas import count_kmers_pallas

DIGIT2CHAR = np.array(list("AGTCN"))

# compiled Mosaic on real TPU, interpreter semantics elsewhere
INTERPRET = jax.default_backend() != "tpu"


def run_kernel(bases, lengths, k, **kw):
    return np.asarray(count_kmers_pallas(jnp.asarray(bases),
                                         jnp.asarray(lengths), k,
                                         interpret=INTERPRET, **kw))


def random_case(rng, m, L, k, with_invalid=True):
    hi = 5 if with_invalid else 4
    bases = rng.integers(0, hi, size=(m, L), dtype=np.int8)
    lengths = rng.integers(k, L + 1, size=m).astype(np.int32)
    for r in range(m):
        bases[r, lengths[r]:] = 4
    return bases, lengths


@pytest.mark.parametrize("k", [2, 3, 4, 5, 6])
def test_matches_xla_path(k):
    rng = np.random.default_rng(k)
    bases, lengths = random_case(rng, 9, 515, k)
    ref = np.asarray(_count_impl(jnp.asarray(bases), jnp.asarray(lengths), k))
    got = run_kernel(bases, lengths, k)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_matches_host_oracle_strings():
    k = 3
    rng = np.random.default_rng(0)
    bases, lengths = random_case(rng, 6, 300, k, with_invalid=True)
    seqs = ["".join(DIGIT2CHAR[row[:n]]) for row, n in zip(bases, lengths)]
    oracle = count_kmers_host(seqs, k)
    got = run_kernel(bases, lengths, k)
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-4)


def test_multi_chunk_rows():
    # length > chunk width forces the inner chunk loop to accumulate
    k = 6
    rng = np.random.default_rng(1)
    bases, lengths = random_case(rng, 8, 5000, k)
    ref = np.asarray(_count_impl(jnp.asarray(bases), jnp.asarray(lengths), k))
    got = run_kernel(bases, lengths, k)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_row_padding_and_short_rows():
    # m not a multiple of the row tile; one row shorter than k -> zero row
    k = 4
    rng = np.random.default_rng(2)
    bases, lengths = random_case(rng, 11, 260, k)
    lengths[3] = k - 1  # fewer than one window
    bases[3, :] = 4
    got = run_kernel(bases, lengths, k)
    assert got.shape == (11, 4 ** k)
    np.testing.assert_array_equal(got[3], 0.0)


def test_unscaled_integer_counts():
    # scaled=False returns raw window counts (exact integers)
    k = 5
    rng = np.random.default_rng(3)
    bases, lengths = random_case(rng, 7, 400, k)
    ref = np.asarray(_count_impl(jnp.asarray(bases), jnp.asarray(lengths), k,
                                 scaled=False))
    got = run_kernel(bases, lengths, k, scaled=False)
    np.testing.assert_array_equal(got, ref)
    assert got.sum() > 0 and np.all(got == np.round(got))


@pytest.mark.parametrize("lpad", [2048, 2053, 2054, 4101])
def test_chunk_boundary_lengths(lpad):
    # Lpad straddling the cw=2048 chunk boundary: single chunk, exactly
    # cw windows, one window into the second chunk, and deep two-chunk
    k = 6
    rng = np.random.default_rng(lpad)
    bases, lengths = random_case(rng, 5, lpad, k)
    lengths[0] = lpad  # full-width row
    bases[0, :] = rng.integers(0, 4, size=lpad)
    ref = np.asarray(_count_impl(jnp.asarray(bases), jnp.asarray(lengths), k))
    got = run_kernel(bases, lengths, k)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_mixed_degenerate_rows():
    # rows with length == k (one window), < k (zero), and all-invalid
    k = 5
    rng = np.random.default_rng(9)
    bases, lengths = random_case(rng, 6, 200, k, with_invalid=False)
    lengths[0] = k          # exactly one window
    bases[0, k:] = 4
    lengths[1] = k - 1      # no windows
    bases[1, :] = 4
    bases[2, :lengths[2]] = 4  # valid length, every base invalid
    ref = np.asarray(_count_impl(jnp.asarray(bases), jnp.asarray(lengths), k))
    got = run_kernel(bases, lengths, k)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert got[1].sum() == 0 and got[2].sum() == 0
    assert abs(got[0].sum() - 1000.0) < 1e-3  # one window -> 1000/kb total


def test_pallas_under_shard_map_on_tpu():
    """The multi-chip count path (dist._sharded_count) runs the kernel
    inside shard_map; Mosaic-under-shard_map only compiles on real TPU
    (CPU meshes dispatch to XLA), so validate it there on a 1-chip mesh."""
    if jax.default_backend() != "tpu":
        pytest.skip("compiled shard_map+Mosaic path needs the TPU backend")
    from seekr_tpu.parallel.dist import distributed_pipeline
    from seekr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:1])
    k = 6
    rng = np.random.default_rng(0)
    m, L = 64, 256  # m >= the row tile so count_graph picks the kernel
    bases, lengths = random_case(rng, m, L, k, with_invalid=False)
    mean = np.zeros(4 ** k, np.float32)
    std = np.ones(4 ** k, np.float32)
    step = distributed_pipeline(mesh, k=k, log2="Log2.none",
                                use_norm_vectors=True)
    counts, _, _, _ = step(bases, lengths, mean, std)
    seqs = ["".join(DIGIT2CHAR[bases[r, :lengths[r]]]) for r in range(m)]
    np.testing.assert_allclose(np.asarray(counts), count_kmers_host(seqs, k),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [7, 8])
def test_large_k(k):
    # larger accumulators (16K / 64K bins) use smaller row tiles
    rng = np.random.default_rng(k)
    bases, lengths = random_case(rng, 5, 700, k)
    ref = np.asarray(_count_impl(jnp.asarray(bases), jnp.asarray(lengths), k))
    got = run_kernel(bases, lengths, k)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [9, 10])
def test_hiblocked_k9_k10(k):
    # k=9/10 dispatch to the hi-blocked kernel variant (n_hi tiled over a
    # third grid axis, accumulator bounded at ~2 MB VMEM); every hi block
    # must pick up exactly its own bins, including at block boundaries
    rng = np.random.default_rng(100 + k)
    bases, lengths = random_case(rng, 10, 120, k)
    seqs = ["".join(DIGIT2CHAR[row[:n]]) for row, n in zip(bases, lengths)]
    oracle = count_kmers_host(seqs, k)
    got = run_kernel(bases, lengths, k)
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-4)
    # unflattened 3-D form reshapes to the same flat matrix
    got3 = run_kernel(bases, lengths, k, flat=False)
    assert got3.ndim == 3
    np.testing.assert_allclose(got3.reshape(got3.shape[0], -1), got,
                               rtol=0, atol=0)


def test_forced_pallas_dispatch_covers_k9_k10(monkeypatch):
    # SEEKR_TPU_COUNT_IMPL=pallas must honor k=9/10 now that the
    # hi-blocked variant exists (it used to silently fall back to XLA)
    from seekr_tpu.ops.count import _impl_choice

    monkeypatch.setenv("SEEKR_TPU_COUNT_IMPL", "pallas")
    assert _impl_choice(9) == "pallas"
    assert _impl_choice(10) == "pallas"
    assert _impl_choice(11) == "xla"  # beyond the kernel: still safe


def test_tpu_default_dispatch_is_pallas_through_k10(monkeypatch):
    # round-3 measurement (exp/kernel_k9_k10.py, BASELINE.md): the
    # hi-blocked kernel beats the XLA scan 3x at k=9/10 on v5e, so the
    # TPU DEFAULT covers the kernel's whole [2, 10] range
    import seekr_tpu.ops.count as count_mod

    monkeypatch.delenv("SEEKR_TPU_COUNT_IMPL", raising=False)
    monkeypatch.setattr(count_mod.jax, "default_backend", lambda: "tpu")
    for k in range(2, 11):
        assert count_mod._impl_choice(k) == "pallas", k
    assert count_mod._impl_choice(11) == "xla"
    assert count_mod._impl_choice(1) == "xla"
