"""Env-knob configuration matrix: every combination computes the same thing.

The framework has independent implementation toggles (count kernel, AOT
executable store, host sort engine).  Each is parity-tested on its own;
this matrix pins the INTERACTIONS — a gating bug that only manifests in
a combination (e.g. AOT store serving a pallas executable while the env
now says xla) would slip past the per-knob tests.
"""

import itertools

import numpy as np
import pytest

DIGIT2CHAR = np.array(list("AGTC"))


def _corpus(tmp_path):
    rng = np.random.default_rng(11)
    path = tmp_path / "m.fa"
    lines = []
    for i in range(12):
        n = int(rng.integers(40, 400))
        lines.append(f">s{i}")
        lines.append("".join(DIGIT2CHAR[rng.integers(0, 4, size=n)]))
    path.write_text("\n".join(lines) + "\n")
    return str(path)


@pytest.fixture(scope="module")
def baseline(tmp_path_factory):
    from seekr_tpu import BasicCounter
    from seekr_tpu.models.pearson import pearson

    fa = _corpus(tmp_path_factory.mktemp("cfg"))
    c = BasicCounter(fa, k=4, silent=True)
    c.get_counts()
    sim = np.asarray(pearson(c.counts, c.counts))
    return fa, np.asarray(c.counts), sim


@pytest.mark.parametrize("count_impl,aot,host_sort", list(itertools.product(
    ["pallas", "xla"], ["on", "off"], ["native", "numpy"])))
def test_knob_combination_matches_default(baseline, tmp_path, monkeypatch,
                                          count_impl, aot, host_sort):
    from seekr_tpu import BasicCounter
    from seekr_tpu.models.pearson import pearson
    from seekr_tpu.stats.adj_pval import adj_pval
    from seekr_tpu.utils import aot as aot_mod

    fa, want_counts, want_sim = baseline
    monkeypatch.setenv("SEEKR_TPU_COUNT_IMPL", count_impl)
    monkeypatch.setenv("SEEKR_TPU_AOT",
                       str(tmp_path / "store") if aot == "on" else "off")
    monkeypatch.setenv("SEEKR_TPU_HOST_SORT", host_sort)
    monkeypatch.setattr(aot_mod, "_LOADED", {})
    monkeypatch.setattr(aot_mod, "_FAST", {})
    monkeypatch.setattr(aot_mod, "_DISABLED", False)

    c = BasicCounter(fa, k=4, silent=True)
    c.get_counts()
    np.testing.assert_allclose(np.asarray(c.counts), want_counts,
                               rtol=1e-4, atol=1e-4, equal_nan=True)
    sim = np.asarray(pearson(c.counts, c.counts))
    np.testing.assert_allclose(sim, want_sim, rtol=1e-4, atol=1e-4,
                               equal_nan=True)
    # the host-stats engine consumes a symmetric p-value matrix downstream
    import pandas as pd

    labels = [f"s{i}" for i in range(sim.shape[0])]
    pvals = pd.DataFrame(np.clip((1.0 - sim) / 2.0, 0.0, 1.0),
                         index=labels, columns=labels)
    adj = adj_pval(pvals, "fdr_bh")
    assert adj is not None
    # symmetric input -> corrections live in the strict upper triangle
    # (reference behavior); diagonal/lower are NaN by design
    triu = adj.values[np.triu_indices(sim.shape[0], k=1)]
    assert np.isfinite(triu).all()
