"""Determinism + large-k sharding tests.

The reference has no concurrency so no race detection (SURVEY.md section 5);
the TPU framework's analog is verifying that sharded reductions are
bitwise-deterministic across invocations and that the kmer-sharded
(tensor-parallel) axis produces identical results to the unsharded path.
"""

import jax
import numpy as np
import pytest

from seekr_tpu.parallel.dist import (count_long_sequence,
                                     distributed_norm_stats,
                                     distributed_pipeline,
                                     shard_long_sequence)
from seekr_tpu.parallel.mesh import make_mesh
from seekr_tpu.ops.count import _count_impl

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _batch(rows, length, k, seed=0):
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 4, size=(rows, length), dtype=np.int8)
    lengths = rng.integers(k + 1, length + 1, size=rows, dtype=np.int32)
    for r in range(rows):
        bases[r, lengths[r]:] = 4
    return bases, lengths


def test_sharded_reductions_bitwise_deterministic():
    """psum-merged moments must be bitwise identical across runs."""
    k = 3
    mesh = make_mesh(jax.devices()[:8])
    bases, lengths = _batch(32, 200, k, seed=11)
    fn = distributed_norm_stats(mesh, k=k)
    m1, s1 = fn(bases, lengths)
    m2, s2 = fn(bases, lengths)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_pipeline_bitwise_deterministic():
    k = 2
    mesh = make_mesh(jax.devices()[:8], kmer_parallel=2)
    bases, lengths = _batch(16, 150, k, seed=12)
    step = distributed_pipeline(mesh, k=k)
    _, _, _, sim1 = step(bases, lengths)
    _, _, _, sim2 = step(bases, lengths)
    np.testing.assert_array_equal(np.asarray(sim1), np.asarray(sim2))


def test_kmer_axis_sharding_matches_unsharded():
    """kmer_parallel=4 (column-sharded histogram) equals the replicated run."""
    k = 4
    bases, lengths = _batch(16, 128, k, seed=13)
    sharded = distributed_pipeline(make_mesh(jax.devices()[:8],
                                             kmer_parallel=4), k=k)
    plain = distributed_pipeline(make_mesh(jax.devices()[:8]), k=k)
    c1, m1, s1, sim1 = sharded(bases, lengths)
    c2, m2, s2, sim2 = plain(bases, lengths)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=1e-5, atol=1e-5, equal_nan=True)
    np.testing.assert_allclose(np.asarray(sim1), np.asarray(sim2),
                               rtol=1e-4, atol=1e-5, equal_nan=True)


def test_sequence_parallel_deterministic_and_matches_single():
    k = 5
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(14)
    digits = rng.integers(0, 4, size=4096, dtype=np.int8)
    chunks, n_windows = shard_long_sequence(digits, k, 8)
    fn = count_long_sequence(mesh, k)
    r1 = np.asarray(fn(chunks, np.float32(n_windows)))
    r2 = np.asarray(fn(chunks, np.float32(n_windows)))
    np.testing.assert_array_equal(r1, r2)
    import jax.numpy as jnp

    single = np.asarray(_count_impl(
        jnp.asarray(digits[None, :]),
        jnp.asarray(np.array([len(digits)], np.int32)), k))[0]
    np.testing.assert_allclose(r1, single, rtol=1e-4, atol=1e-3)


def test_stream_pearson_sharded_matches_dense(tmp_path):
    from seekr_tpu.io.stream import StreamingNpyWriter
    from seekr_tpu.models.pearson import pearson
    from seekr_tpu.parallel.dist import stream_pearson_sharded

    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(21)
    counts = rng.normal(size=(48, 64)).astype(np.float32)
    dense = pearson(counts, counts)
    path = str(tmp_path / "sim.npy")
    with StreamingNpyWriter(path, (48, 48)) as w:
        stream_pearson_sharded(mesh, counts, w, block_rows=16)
    np.testing.assert_allclose(np.load(path), dense, rtol=1e-5, atol=1e-6)
