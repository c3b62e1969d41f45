"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from seekr_tpu.io.encode import encode_seq
from seekr_tpu.ops.count import count_kmers_host
from seekr_tpu.parallel.mesh import make_mesh
from seekr_tpu.parallel.dist import (
    count_long_sequence,
    distributed_norm_stats,
    distributed_pipeline,
    shard_long_sequence,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _batch(rows, length, k, seed=0):
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 4, size=(rows, length), dtype=np.int8)
    lengths = rng.integers(k + 1, length + 1, size=rows, dtype=np.int32)
    for r in range(rows):
        bases[r, lengths[r]:] = 4
    return bases, lengths


def _decode(bases, lengths):
    letters = np.array(list("AGTC"))
    return ["".join(letters[bases[r, : lengths[r]]]) for r in range(bases.shape[0])]


def test_distributed_pipeline_matches_single_device():
    k = 3
    mesh = make_mesh(jax.devices()[:8], kmer_parallel=2)
    bases, lengths = _batch(16, 128, k)
    step = distributed_pipeline(mesh, k=k)
    counts, mean, std, sim = step(bases, lengths)

    # single-device oracle via host counter + numpy epilogue
    seqs = _decode(bases, lengths)
    raw = count_kmers_host(seqs, k)
    c = raw - raw.mean(axis=0)
    c /= c.std(axis=0)
    c += np.abs(c.min())
    c = np.log2(c + 1)
    assert np.allclose(np.asarray(counts), c, rtol=1e-4, atol=1e-4, equal_nan=True)

    cs = (c - c.mean(axis=1, keepdims=True)) / c.std(axis=1, keepdims=True)
    expected_sim = cs @ cs.T / c.shape[1]
    assert np.allclose(np.asarray(sim), expected_sim, rtol=1e-3, atol=1e-4, equal_nan=True)


def test_distributed_norm_stats_psum():
    k = 2
    mesh = make_mesh(jax.devices()[:8])
    bases, lengths = _batch(24, 128, k, seed=3)
    mean, std = distributed_norm_stats(mesh, k=k, log2="Log2.none")(bases, lengths)
    raw = count_kmers_host(_decode(bases, lengths), k)
    assert np.allclose(np.asarray(mean), raw.mean(axis=0), rtol=1e-5, atol=1e-4)
    assert np.allclose(np.asarray(std), raw.std(axis=0), rtol=1e-4, atol=1e-4)


def test_kmer_axis_sharding_at_large_k():
    """k=10: 4^10 = 1,048,576 histogram columns sharded 4-way over 'kmer'.

    The scenario the kmer axis exists for (SURVEY section 2: column-sharded
    k-mer space for large k): the [m, 4^k] count matrix, the [4^k] norm
    vectors, and the Pearson contraction over the sharded column axis
    (GSPMD inserts the psum) all live column-sharded.  Per-chip HBM for the
    count matrix is m x 262,144 f32 per shard here — at GENCODE scale
    (m~13k) that is 13 GB unsharded vs 3.3 GB/chip at kmer_parallel=4,
    which is what makes k=10 fit a 16 GB v5e at all.
    """
    k = 10
    n_cols = 4 ** k
    mesh = make_mesh(jax.devices()[:8], kmer_parallel=4)
    bases, lengths = _batch(8, 256, k, seed=11)

    rng = np.random.default_rng(12)
    mean = rng.normal(0.0, 0.5, size=n_cols).astype(np.float32)
    std = np.ones(n_cols, dtype=np.float32)

    step = distributed_pipeline(mesh, k=k, log2="Log2.none",
                                use_norm_vectors=True)
    counts, out_mean, out_std, sim = step(bases, lengths, mean, std)
    assert counts.shape == (8, n_cols)

    raw = count_kmers_host(_decode(bases, lengths), k)
    expected = raw - mean  # std is ones
    got = np.asarray(counts)
    assert np.allclose(got, expected, rtol=1e-4, atol=1e-4)

    cs = (expected - expected.mean(axis=1, keepdims=True))
    cs /= cs.std(axis=1, keepdims=True)
    expected_sim = cs @ cs.T / n_cols
    assert np.allclose(np.asarray(sim), expected_sim, rtol=1e-3, atol=1e-4)


def test_sequence_parallel_long_transcript():
    k = 6
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list("AGTCN"), size=10_000, p=[0.24, 0.24, 0.24, 0.24, 0.04]))
    digits = encode_seq(seq)
    chunks, n_windows = shard_long_sequence(digits, k, 8)
    row = count_long_sequence(mesh, k)(chunks, np.float32(n_windows))
    expected = count_kmers_host([seq], k)[0]
    assert np.allclose(np.asarray(row), expected, rtol=1e-4, atol=1e-3)


class _Collect:
    def __init__(self):
        self.blocks = []

    def append(self, b):
        self.blocks.append(np.asarray(b))

    def result(self):
        return np.vstack(self.blocks)


def test_stream_pearson_sharded_cross_and_padding():
    """Cross-matrix streaming with row counts NOT divisible by the data axis."""
    from seekr_tpu.ops.pearson import pearson_device
    from seekr_tpu.parallel.dist import stream_pearson_sharded

    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(3)
    c1 = rng.normal(size=(13, 64)).astype(np.float32)
    c2 = rng.normal(size=(11, 64)).astype(np.float32)

    w = _Collect()
    stream_pearson_sharded(mesh, c1, w, block_rows=5, counts2=c2)
    got = w.result()
    assert got.shape == (13, 11)
    np.testing.assert_allclose(got, np.asarray(pearson_device(c1, c2)),
                               rtol=1e-4, atol=1e-5)

    w2 = _Collect()
    stream_pearson_sharded(mesh, c1, w2, block_rows=4)
    np.testing.assert_allclose(w2.result(),
                               np.asarray(pearson_device(c1, c1)),
                               rtol=1e-4, atol=1e-5)


def test_graft_entry_contract():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = fn(*args)
    assert out.shape == (args[0].shape[0], args[0].shape[0])
    mod.dryrun_multichip(8)


def test_init_distributed_single_process_noop():
    from seekr_tpu.parallel.dist import init_distributed

    # must not raise or attempt a rendezvous
    init_distributed()
    init_distributed(num_processes=1)


def test_sharding_helpers_place_arrays():
    from seekr_tpu.parallel.mesh import (data_sharding, replicated,
                                         row_col_sharding)

    mesh = make_mesh(kmer_parallel=2)  # 4 x 2 over the 8 virtual devices
    x = jax.device_put(np.zeros((8, 16), np.float32), data_sharding(mesh))
    # rows split over the 4-way data axis, columns replicated
    assert x.addressable_shards[0].data.shape == (2, 16)
    y = jax.device_put(np.zeros((8, 16), np.float32), row_col_sharding(mesh))
    assert y.addressable_shards[0].data.shape == (2, 8)
    z = jax.device_put(np.zeros((8,), np.float32), replicated(mesh))
    assert z.addressable_shards[0].data.shape == (8,)
    v = jax.device_put(np.zeros((8,), np.float32), data_sharding(mesh, ndim=1))
    assert v.addressable_shards[0].data.shape == (2,)


def test_ecdf_sf_matches_host_empirical():
    from seekr_tpu.ops.ecdf import ecdf_sf, empirical_pvals

    rng = np.random.default_rng(0)
    bkg = rng.normal(size=257).astype(np.float32)
    bkg[10:20] = bkg[0]  # ties
    r = np.concatenate([rng.normal(size=40), bkg[:5],
                        [bkg.min() - 1, bkg.max() + 1]]).astype(np.float32)
    got = np.asarray(ecdf_sf(jax.numpy.sort(jax.numpy.asarray(bkg)),
                             jax.numpy.asarray(r)))
    expected = empirical_pvals(bkg, r)
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=0)


def test_count_long_sequence_shorter_than_k_is_zeros():
    from seekr_tpu.ops.count import split_long_digits
    from seekr_tpu.parallel.dist import (count_long_sequence,
                                         shard_long_sequence)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    fn = None
    for digits in (np.array([], np.int8), np.array([0, 1], np.int8)):
        chunks, n_windows = shard_long_sequence(digits, 3, n_dev)
        assert n_windows <= 0
        fn = count_long_sequence(mesh, 3)
        out = np.asarray(fn(chunks, np.int32(n_windows)))
        assert out.shape == (64,) and (out == 0).all() and np.isfinite(out).all()
    # split_long_digits keeps chunk width >= 1 even for empty input
    chunks, _ = split_long_digits(np.array([], np.int8), 3, 4)
    assert chunks.shape[1] >= 3


def test_distributed_pipeline_flat_false_matches_flat():
    """flat=False keeps the per-chip 3-D count layout end to end; the
    host reshape of the fetched normalized tensor and the Pearson matrix
    must match the flat pipeline (ops.count_graph byte contract)."""
    k = 3
    mesh = make_mesh(jax.devices()[:8], kmer_parallel=2)
    bases, lengths = _batch(16, 128, k)
    ref_counts, ref_mean, ref_std, ref_sim = distributed_pipeline(
        mesh, k=k)(bases, lengths)
    counts3, mean3, std3, sim3 = distributed_pipeline(
        mesh, k=k, flat=False)(bases, lengths)
    c3 = np.asarray(counts3)
    assert c3.ndim == 3
    assert np.allclose(c3.reshape(c3.shape[0], -1), np.asarray(ref_counts),
                       rtol=1e-5, atol=1e-5, equal_nan=True)
    assert mean3.ndim == 1 and std3.ndim == 1
    assert np.allclose(np.asarray(mean3), np.asarray(ref_mean), rtol=1e-6)
    assert np.allclose(np.asarray(sim3), np.asarray(ref_sim), rtol=1e-4,
                       atol=1e-5, equal_nan=True)


def test_distributed_pipeline_flat_false_norm_vectors():
    """flat=False composes with the kmer-sharded norm-vector mode."""
    k = 3
    mesh = make_mesh(jax.devices()[:8], kmer_parallel=2)
    bases, lengths = _batch(16, 128, k)
    rng = np.random.default_rng(3)
    mean_vec = rng.uniform(10, 50, size=4 ** k).astype(np.float32)
    std_vec = rng.uniform(0.5, 3.0, size=4 ** k).astype(np.float32)
    ref = distributed_pipeline(mesh, k=k, use_norm_vectors=True)(
        bases, lengths, mean_vec, std_vec)
    got = distributed_pipeline(mesh, k=k, use_norm_vectors=True,
                               flat=False)(bases, lengths, mean_vec,
                                           std_vec)
    c3 = np.asarray(got[0])
    assert np.allclose(c3.reshape(c3.shape[0], -1), np.asarray(ref[0]),
                       rtol=1e-5, atol=1e-5, equal_nan=True)
    assert np.allclose(np.asarray(got[3]), np.asarray(ref[3]), rtol=1e-4,
                       atol=1e-5, equal_nan=True)


def test_distributed_pipeline_flat_false_kmer_divisibility_error():
    """flat=False shards n_hi (far coarser than 4^k); an indivisible
    kmer axis must fail with an actionable message at trace time, not an
    opaque pjit sharding error."""
    mesh = make_mesh(jax.devices()[:8], kmer_parallel=8)
    bases, lengths = _batch(16, 128, 2)  # k=2: n_hi is tiny (< 8)
    step = distributed_pipeline(mesh, k=2, flat=False)
    with pytest.raises(ValueError, match="n_hi"):
        step(bases, lengths)


def test_stream_pearson_sharded_accepts_committed_device_arrays():
    # a committed single-device array (user device_put, or an output of
    # an AOT-store-loaded executable carrying its compile-time placement)
    # must not crash the mesh path with "Received incompatible devices";
    # _mesh_compatible fetches it to host first (jit outputs are
    # uncommitted and pass through untouched)
    import jax

    from seekr_tpu.io.stream import ArrayCollector
    from seekr_tpu.parallel.dist import stream_pearson_sharded
    from seekr_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    if len(devs) < 2:
        import pytest

        pytest.skip("needs >=2 devices")
    mesh = make_mesh(devs[:2])
    rng = np.random.default_rng(3)
    c = rng.normal(size=(6, 16)).astype(np.float32)
    committed = jax.device_put(c, devs[0])
    assert committed.committed

    w = ArrayCollector()
    stream_pearson_sharded(mesh, committed, w, block_rows=4)
    got = w.result()
    from seekr_tpu.ops.pearson import pearson_device

    want = np.asarray(pearson_device(c, c))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_scorer_matches_oracle():
    """make_sharded_scorer: row-sharded corpus sim + two-stage top-k vs
    the single-device pearson oracle (serving analog of the pipeline)."""
    from seekr_tpu.ops.pearson import (pearson_against_standardized,
                                       standardize_rows)
    from seekr_tpu.parallel.dist import make_sharded_scorer

    rng = np.random.default_rng(7)
    n_t, n_cols, n_q = 13, 64, 5  # 13 rows: non-divisible over 8 devices
    targets = rng.normal(size=(n_t, n_cols)).astype(np.float32)
    qc = rng.normal(size=(n_q, n_cols)).astype(np.float32)
    tstd = np.asarray(standardize_rows(targets))

    scorer = make_sharded_scorer(make_mesh(), tstd)
    assert scorer.t_real == n_t
    oracle = np.asarray(pearson_against_standardized(qc, tstd))
    # device sim is column-padded to a device multiple (13 -> 16);
    # sim_host gathers + slices
    assert np.asarray(scorer.sim(qc)).shape == (n_q, 16)
    np.testing.assert_allclose(scorer.sim_host(qc), oracle,
                               rtol=1e-5, atol=1e-6)

    # the two-stage selection (per-shard top-k, candidates over ICI,
    # final merge) must return GLOBAL indices and exact values
    vals, idx = (np.asarray(a) for a in scorer.topk(qc, 4))
    assert np.array_equal(idx, np.argsort(-oracle, axis=1)[:, :4])
    np.testing.assert_allclose(vals, np.take_along_axis(oracle, idx, 1),
                               rtol=1e-5, atol=1e-6)

    # mixed sim+topk from ONE shard-local GEMM: identical products
    s3, v3, i3 = scorer.sim_and_topk(qc, 4)
    np.testing.assert_allclose(np.asarray(s3)[:, :n_t], oracle,
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(i3), idx)
    np.testing.assert_allclose(np.asarray(v3), vals, rtol=1e-6, atol=0)

    # n > T clamps to T, and the pad rows (13 -> 16) can never surface
    vals_all, idx_all = (np.asarray(a) for a in scorer.topk(qc, 100))
    assert vals_all.shape == (n_q, n_t)
    assert idx_all.max() < n_t and np.isfinite(vals_all).all()


def test_ecdf_sf_n_total_keeps_reference_denominator():
    """With NaNs dropped before sorting, n_total= keeps the reference's
    full-sample denominator (review finding: dividing by the finite
    count alone inflates every p-value on a NaN-containing
    background)."""
    import jax.numpy as jnp

    from seekr_tpu.ops.ecdf import ecdf_sf, empirical_pvals

    rng = np.random.default_rng(31)
    bkg = rng.normal(size=1000)
    bkg[::10] = np.nan
    finite = np.sort(bkg[~np.isnan(bkg)]).astype(np.float32)
    r = rng.normal(size=64).astype(np.float32)
    got = np.asarray(ecdf_sf(jnp.asarray(finite), jnp.asarray(r),
                             n_total=len(bkg)))
    want = empirical_pvals(bkg, r).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
