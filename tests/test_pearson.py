import numpy as np

from seekr_tpu import pearson


def _np_pearson(c1, c2):
    c1 = (c1.T - np.mean(c1, axis=1)).T
    c1 = (c1.T / np.std(c1, axis=1)).T
    c2 = (c2.T - np.mean(c2, axis=1)).T
    c2 = (c2.T / np.std(c2, axis=1)).T
    return np.inner(c1, c2) / c1.shape[1]


def test_small_matrix_matches_numpy():
    rng = np.random.default_rng(7)
    a = rng.normal(size=(3, 5)).astype(np.float32)
    b = rng.normal(size=(4, 5)).astype(np.float32)
    # tolerance = the documented parity budget: Precision.HIGH on TPU is
    # within 1.3e-5 of float64 (ops/precision.py); CPU f32 is tighter
    assert np.allclose(pearson(a, b), _np_pearson(a, b), rtol=1e-4, atol=1e-4)


def test_perfect_correlation_rows():
    a = np.array([[1, 2, 3, 4, 5]], dtype=np.float32)
    b = np.array([[2, 4, 6, 8, 10], [11, 12, 13, 14, 15]], dtype=np.float32)
    assert np.allclose(pearson(a, b), np.ones((1, 2)), atol=1e-6)


def test_anticorrelation():
    a = np.array([[1, 2, 3, 4, 5], [5, 4, 3, 2, 1]], dtype=np.float32)
    r = pearson(a, a)
    assert np.allclose(r, [[1, -1], [-1, 1]], atol=1e-6)


def test_matches_numpy_corrcoef():
    rng = np.random.default_rng(11)
    a = rng.uniform(0, 10, size=(6, 64)).astype(np.float32)
    assert np.allclose(pearson(a, a), np.corrcoef(a), rtol=1e-4, atol=1e-5)


def test_no_row_standardize():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(3, 8)).astype(np.float32)
    expected = np.inner(a, a) / a.shape[1]
    assert np.allclose(pearson(a, a, row_standardize=False), expected,
                       rtol=1e-4, atol=1e-4)  # documented parity budget


def test_outfile(tmp_path):
    a = np.array([[1, 2, 3, 4, 5], [5, 4, 3, 2, 1]], dtype=np.float32)
    out = str(tmp_path / "p.npy")
    r = pearson(a, a, outfile=out)
    assert np.allclose(np.load(out), r)


def test_pearson_against_standardized_matches_pearson_device():
    # serving fast path: standardize-once targets must be bitwise equal
    # to the per-call pearson_device result
    import numpy as np

    from seekr_tpu.ops.pearson import (pearson_against_standardized,
                                       pearson_device, standardize_rows)

    rng = np.random.default_rng(11)
    q = rng.normal(size=(7, 64)).astype(np.float32)
    t = rng.normal(size=(23, 64)).astype(np.float32)
    want = np.asarray(pearson_device(q, t))
    got = np.asarray(pearson_against_standardized(q, standardize_rows(t)))
    np.testing.assert_array_equal(got, want)


def test_pearson_pairs_index_validation_and_negatives():
    """jnp.take clamps out-of-range indices silently — the wrapper must
    raise like numpy would (review finding), and honor numpy's negative
    indexing."""
    import numpy as np
    import pytest

    from seekr_tpu.ops.pearson import pearson_pairs

    rng = np.random.default_rng(0)
    c = rng.normal(size=(6, 32)).astype(np.float32)
    with pytest.raises(IndexError):
        pearson_pairs(c, [6], [0])
    with pytest.raises(IndexError):
        pearson_pairs(c, [0], [-7])
    got = pearson_pairs(c, [-1, 0], [0, -2])
    want = pearson_pairs(c, [5, 0], [0, 4])
    np.testing.assert_array_equal(got, want)


def test_self_similarity_is_bitwise_symmetric_blocked():
    """Self-comparison output must be EXACTLY symmetric even through the
    row-blocked path with ragged blocks — the reference's np.inner is
    bitwise symmetric and downstream adj_pval's 5-dp detector flips to
    full-matrix correction otherwise (observed live at m=13k)."""
    import numpy as np

    import seekr_tpu.models.pearson as mp

    rng = np.random.default_rng(3)
    c = rng.normal(size=(50, 64)).astype(np.float32)
    old = mp._BLOCK_THRESHOLD
    mp._BLOCK_THRESHOLD = 100  # force the blocked path, ragged last block
    try:
        sim = mp.pearson(c, c)
    finally:
        mp._BLOCK_THRESHOLD = old
    assert sim.shape == (50, 50)
    np.testing.assert_array_equal(sim, sim.T)


def test_equal_content_numpy_arrays_take_self_path():
    """Two separately-loaded copies of the same counts are a
    self-comparison too (find_pval's historical calling pattern)."""
    import numpy as np

    from seekr_tpu.models.pearson import pearson

    rng = np.random.default_rng(4)
    c = rng.normal(size=(20, 32)).astype(np.float32)
    sim = pearson(c, c.copy())
    np.testing.assert_array_equal(sim, sim.T)


def test_mirror_upper_inplace_blockwise():
    import numpy as np

    from seekr_tpu.models.pearson import _mirror_upper_inplace

    rng = np.random.default_rng(5)
    a = rng.normal(size=(37, 37))
    want_upper = np.triu(a).copy()
    _mirror_upper_inplace(a, block=8)  # ragged blocking
    np.testing.assert_array_equal(a, a.T)
    np.testing.assert_array_equal(np.triu(a), want_upper)


def test_self_path_detected_with_nan_columns():
    """Two loads of a counts artifact carrying NaN columns (computed-std
    Log2.post, documented) are still a self-comparison; int inputs (the
    reference's own test matrices) must not crash the detection."""
    import numpy as np

    from seekr_tpu.models.pearson import pearson

    rng = np.random.default_rng(6)
    c = rng.normal(size=(12, 16)).astype(np.float32)
    c[:, 3] = np.nan
    sim = pearson(c, c.copy())
    valid = ~np.isnan(sim)
    np.testing.assert_array_equal(sim[valid], sim.T[valid])
    # int inputs take the fallback compare without raising
    ci = rng.integers(0, 9, size=(5, 8))
    sim = pearson(ci, ci.copy())
    np.testing.assert_array_equal(sim, sim.T)
