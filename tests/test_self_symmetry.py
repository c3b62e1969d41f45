"""Self-comparison symmetry contract across every producer path.

The reference's np.inner makes self-similarity bitwise symmetric, so
adj_pval's 5-decimal detector always takes the upper-triangle path for
self comparisons.  Our blocked/sharded GEMMs compute (i,j) and (j,i) in
different tiles (documented ~1e-5 retiling differences — measured
flipping the detector live at m=13k), so every in-memory self path must
mirror to exact symmetry (models.pearson.mirror_upper_inplace), and the
streamed-artifact consumer must accept --symmetric yes.
"""

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def self_fa(tmp_path):
    rng = np.random.default_rng(7)
    letters = np.array(list("AGTC"))
    fa = tmp_path / "self.fa"
    with open(fa, "w") as fh:
        for i in range(24):
            seq = "".join(letters[rng.integers(0, 4, 200)])
            fh.write(f">S{i}\n{seq}\n")
    mean = tmp_path / "mean.npy"
    std = tmp_path / "std.npy"
    np.save(mean, rng.uniform(1.0, 3.0, 16))
    np.save(std, rng.uniform(0.5, 1.5, 16))
    fit = rng.normal(0.3, 0.2, 500).astype(np.float32)
    return str(fa), str(mean), str(std), fit


def test_find_pval_same_file_counts_once_and_is_symmetric(self_fa):
    from seekr_tpu.stats.find_pval import find_pval

    fa, mean, std, fit = self_fa
    df = find_pval(fa, fa, mean, std, 2, fit, log2="Log2.post",
                   progress_bar=False)
    np.testing.assert_array_equal(df.values, df.values.T)


def test_find_pval_copied_file_detected_as_self(self_fa, tmp_path):
    """cp a.fa b.fa must behave like the same-file case: the reference's
    np.inner is bitwise symmetric for identical content regardless of
    the file name (detected on device; only a bool crosses the wire)."""
    import shutil

    from seekr_tpu.stats.find_pval import find_pval

    fa, mean, std, fit = self_fa
    fa2 = str(tmp_path / "copy.fa")
    shutil.copy(fa, fa2)
    df = find_pval(fa, fa2, mean, std, 2, fit, log2="Log2.post",
                   progress_bar=False)
    np.testing.assert_array_equal(df.values, df.values.T)


def test_find_pval_mesh_self_path_is_symmetric(self_fa):
    """The data-parallel in-memory path (ArrayCollector from the sharded
    GEMM) must mirror like the non-mesh path."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device virtual mesh")
    from seekr_tpu.stats.find_pval import find_pval

    fa, mean, std, fit = self_fa
    df = find_pval(fa, fa, mean, std, 2, fit, log2="Log2.post",
                   progress_bar=False, data_parallel=2)
    np.testing.assert_array_equal(df.values, df.values.T)


def test_workflow_big_pearson_blocked_self_is_symmetric(monkeypatch,
                                                        tmp_path):
    """The workflow's self-similarity (feeding adj_pval/leiden) goes
    through pearson_blocked directly — it must carry the same mirror."""
    import seekr_tpu.models.workflow as wf

    # reach the inner closure via the public pipeline at blocked scale:
    # force pearson_blocked for any size by shrinking the threshold used
    # by models.pearson, then call the module-level pieces the same way
    # big_pearson does
    from seekr_tpu.models.pearson import mirror_upper_inplace  # noqa: F401
    from seekr_tpu.ops.pearson import pearson_blocked

    rng = np.random.default_rng(8)
    c = rng.normal(size=(40, 16)).astype(np.float32)
    sim = pearson_blocked(c, c, block_rows=16)  # ragged blocks
    # raw blocked output makes no symmetry promise; the workflow mirrors:
    mirror_upper_inplace(sim)
    np.testing.assert_array_equal(sim, sim.T)

    # and the actual workflow self run produces a symmetric pval matrix
    letters = np.array(list("AGTC"))
    fa = tmp_path / "w.fa"
    with open(fa, "w") as fh:
        for i in range(12):
            fh.write(f">W{i}\n" +
                     "".join(letters[rng.integers(0, 4, 150)]) + "\n")
    out = tmp_path / "out"
    wf.run_workflow(str(fa), background=str(fa), k=2, outdir=str(out),
                    log2="Log2.post", seed=0)
    pv = pd.read_csv(out / "pvals.csv", index_col=0)
    np.testing.assert_array_equal(pv.values, pv.values.T)


def test_cli_adj_pval_symmetric_flag(tmp_path, monkeypatch):
    from seekr_tpu.cli import console_adj_pval

    rng = np.random.default_rng(9)
    p = rng.uniform(size=(30, 30)).astype(np.float64)  # NOT symmetric
    src = tmp_path / "p.npy"
    np.save(src, p)
    monkeypatch.chdir(tmp_path)

    # --symmetric yes forces the triu contract on a streamed artifact
    console_adj_pval([str(src), "fdr_bh", "-bi", "-o", "forced",
                      "--symmetric", "yes"])
    forced = pd.read_csv(tmp_path / "forced.csv", index_col=0)
    assert np.isnan(np.tril(np.full((30, 30), 1.0)) *
                    forced.values).all() or np.isnan(
        forced.values[np.tril_indices(30, 0)]).all()
    assert np.isfinite(forced.values[np.triu_indices(30, 1)]).all()

    # auto on the same asymmetric artifact corrects the full matrix
    console_adj_pval([str(src), "fdr_bh", "-bi", "-o", "auto_out"])
    auto = pd.read_csv(tmp_path / "auto_out.csv", index_col=0)
    assert np.isfinite(auto.values).all()

    # the flag is a streamed-mode extension: without -bi it must error
    with pytest.raises(SystemExit):
        console_adj_pval([str(src), "fdr_bh", "--symmetric", "yes"])


def test_find_pval_different_content_not_collapsed(self_fa, tmp_path):
    """Genuinely different fastas of the same shape must NOT take the
    self path (the p-value matrix keeps its true cross values)."""
    rng = np.random.default_rng(10)
    letters = np.array(list("AGTC"))
    fa, mean, std, fit = self_fa
    fa2 = str(tmp_path / "other.fa")
    with open(fa2, "w") as fh:
        for i in range(24):  # same m, same lengths, different content
            fh.write(f">O{i}\n" +
                     "".join(letters[rng.integers(0, 4, 200)]) + "\n")
    from seekr_tpu.stats.find_pval import find_pval

    df = find_pval(fa, fa2, mean, std, 2, fit, log2="Log2.post",
                   progress_bar=False)
    assert not np.array_equal(df.values, df.values.T)
