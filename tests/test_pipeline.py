"""Direct tests for SeekrPipeline (models/pipeline.py) — the fused
count -> normalize -> Pearson graph the driver compile-checks and the
bench drives.  Covers both sides of the forced-flat GEMM layout gate,
the flat/3-D counts contract, and equivalence with the stepwise ops.
"""

import jax
import numpy as np
import pytest

from seekr_tpu.models import pipeline as pipeline_mod
from seekr_tpu.models.pipeline import SeekrPipeline
from seekr_tpu.ops.count import count_kmers_host


def _batch(m, L, k, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(k + 1, L + 1, size=m).astype(np.int32)
    bases = rng.integers(0, 4, size=(m, L), dtype=np.int8)
    for r in range(m):
        bases[r, lengths[r]:] = 4
    return bases, lengths


def _decode(bases, lengths):
    letters = np.array(list("AGTC"))
    return ["".join(letters[bases[r, :lengths[r]]])
            for r in range(bases.shape[0])]


def _oracle(bases, lengths, k, log2):
    raw = count_kmers_host(_decode(bases, lengths), k)
    c = raw.astype(np.float64)
    if log2 == "Log2.pre":
        c = np.log2(c + 1)
    mean = c.mean(axis=0)
    c = c - mean
    std = c.std(axis=0)
    c = c / std
    if log2 == "Log2.post":
        c = c + np.abs(c.min())
        c = np.log2(c + 1)
    cs = (c - c.mean(axis=1, keepdims=True)) / c.std(axis=1, keepdims=True)
    return c, cs @ cs.T / c.shape[1]


@pytest.mark.parametrize("log2", ["Log2.none", "Log2.pre", "Log2.post"])
def test_forward_matches_stepwise_oracle(log2):
    k = 3
    bases, lengths = _batch(24, 96, k)
    sim = np.asarray(jax.jit(SeekrPipeline(k=k, log2=log2).forward)(
        bases, lengths))
    _, expected = _oracle(bases, lengths, k, log2)
    np.testing.assert_allclose(sim, expected, rtol=1e-3, atol=1e-4)


def test_forward_identical_across_layout_gate(monkeypatch):
    """The forced-flat barrier (m <= _GEMM_FLAT_MAX_ROWS) must not change
    values — only the GEMM's input layout."""
    k = 3
    bases, lengths = _batch(16, 96, k)
    pipe = SeekrPipeline(k=k, log2="Log2.post")
    with_barrier = np.asarray(jax.jit(pipe.forward)(bases, lengths))
    monkeypatch.setattr(pipeline_mod, "_GEMM_FLAT_MAX_ROWS", 0)
    without_barrier = np.asarray(jax.jit(pipe.forward)(bases, lengths))
    np.testing.assert_allclose(with_barrier, without_barrier, rtol=1e-5,
                               atol=1e-6)


def test_counts_flat_contract_and_norm_vectors():
    k = 3
    bases, lengths = _batch(20, 80, k)
    pipe = SeekrPipeline(k=k, log2="Log2.post")
    flat, mean_f, std_f = pipe.counts(bases, lengths)
    three, mean_3, std_3 = pipe.counts(bases, lengths, flat=False)
    assert np.asarray(flat).ndim == 2 and np.asarray(three).ndim == 3
    # raw counts are bitwise identical across layouts (pinned in
    # test_count_pallas); the NORMALIZE reductions (column mean/std,
    # global min) tile differently over [m, 4^k] vs [m, n_hi, n_lo] on
    # TPU — measured ~1.5e-6 rel at k=3, pure reduction-order float noise
    np.testing.assert_allclose(
        np.asarray(three).reshape(np.asarray(three).shape[0], -1),
        np.asarray(flat), rtol=1e-5, atol=1e-6)
    # mean/std come back flat [4^k] in BOTH modes
    for v in (mean_f, std_f, mean_3, std_3):
        assert np.asarray(v).shape == (4 ** k,)
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_3),
                               rtol=1e-5, atol=1e-5)


def test_forward_with_provided_norm_vectors():
    k = 2
    bases, lengths = _batch(12, 64, k)
    rng = np.random.default_rng(1)
    mean = rng.uniform(20, 60, size=4 ** k).astype(np.float32)
    std = rng.uniform(0.5, 2.0, size=4 ** k).astype(np.float32)
    sim = np.asarray(jax.jit(SeekrPipeline(k=k, log2="Log2.none").forward)(
        bases, lengths, mean, std))
    raw = count_kmers_host(_decode(bases, lengths), k).astype(np.float64)
    c = (raw - mean) / std
    cs = (c - c.mean(axis=1, keepdims=True)) / c.std(axis=1, keepdims=True)
    np.testing.assert_allclose(sim, cs @ cs.T / c.shape[1], rtol=1e-3,
                               atol=1e-4)


def test_invalid_log2_rejected():
    with pytest.raises(ValueError):
        SeekrPipeline(k=3, log2="Log2.maybe")
