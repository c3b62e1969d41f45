"""Tests for the one-shot end-to-end workflow (extension command).

The workflow must produce the same numbers as the equivalent chain of
reference-compatible commands run step by step.
"""

import numpy as np
import pandas as pd
import pytest

from seekr_tpu.cli import main
from seekr_tpu.models.counter import KmerCounter
from seekr_tpu.models.pearson import pearson
from seekr_tpu.models.workflow import run_workflow
from seekr_tpu.ops.ecdf import empirical_pvals


@pytest.fixture(scope="module")
def corpora(ref_data):
    return (str(ref_data.parent / "ldseq.fa"),   # queries (21 seqs)
            str(ref_data.parent / "seqs1.fa"))   # background (111 seqs)


def test_workflow_matches_stepwise_chain(corpora, tmp_path):
    queries, background = corpora
    k = 2
    res = run_workflow(queries, background=background, k=k,
                       outdir=str(tmp_path / "out"), subset_size=10 ** 9)

    # stepwise oracle
    bkg = KmerCounter(background, k=k, silent=True)
    bkg.get_counts()
    np.testing.assert_allclose(res["mean"], np.asarray(bkg.mean), rtol=1e-6)
    np.testing.assert_allclose(res["std"], np.asarray(bkg.std), rtol=1e-6)

    c1 = KmerCounter(queries, mean=np.asarray(bkg.mean),
                     std=np.asarray(bkg.std), k=k, silent=True)
    c1.get_counts()
    np.testing.assert_allclose(res["counts1"], c1.counts, rtol=1e-5,
                               atol=1e-5)
    sim = pearson(c1.counts, c1.counts)
    np.testing.assert_allclose(res["pearson"], sim, rtol=1e-5, atol=1e-5)

    bkg2 = KmerCounter(background, mean=np.asarray(bkg.mean),
                       std=np.asarray(bkg.std), k=k, silent=True)
    bkg2.get_counts()
    bsim = pearson(bkg2.counts, bkg2.counts)
    null = bsim[np.triu_indices(bsim.shape[0], k=1)]
    expected_p = np.asarray(empirical_pvals(null, sim), dtype=sim.dtype)
    np.testing.assert_allclose(res["pvals"].values, expected_p, atol=1e-6)

    # adjusted upper triangle is the corrected version of pvals
    adj = res["pvals_adjusted"]
    assert adj is not None
    assert np.isnan(np.diag(adj.values)).all()


def test_workflow_artifacts_and_cli(corpora, tmp_path, monkeypatch):
    queries, background = corpora
    monkeypatch.chdir(tmp_path)
    assert main(["pipeline", queries, "-b", background, "-k", "2",
                 "-o", "res", "-sbs", "500", "-sd", "0"]) == 0
    for artifact in ("mean_2mers.npy", "std_2mers.npy", "counts1.csv",
                     "pearson.csv", "pvals.csv", "pvals_adjusted.csv"):
        assert (tmp_path / "res" / artifact).exists(), artifact
    pv = pd.read_csv(tmp_path / "res" / "pvals.csv", index_col=0)
    assert pv.shape == (21, 21)
    assert ((pv.values >= 0) & (pv.values <= 1)).all()


def test_workflow_mesh_matches_single_device(corpora, tmp_path):
    """-dp/-kp mesh routing of the Pearson stages is numerically equivalent."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    queries, background = corpora
    base = run_workflow(queries, seq2file=background, background=background,
                        k=2, outdir=str(tmp_path / "a"), subset_size=10 ** 9)
    meshed = run_workflow(queries, seq2file=background, background=background,
                          k=2, outdir=str(tmp_path / "b"),
                          subset_size=10 ** 9, data_parallel=2,
                          kmer_parallel=2)
    np.testing.assert_allclose(meshed["pearson"], base["pearson"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.sort(meshed["null_sample"]),
                               np.sort(base["null_sample"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(meshed["pvals"].values, base["pvals"].values,
                               atol=1e-5)


def test_workflow_mesh_too_many_devices_raises(corpora, tmp_path):
    queries, background = corpora
    with pytest.raises(ValueError, match="requested"):
        run_workflow(queries, background=background, k=2,
                     outdir=str(tmp_path / "c"), data_parallel=10 ** 6)


def test_workflow_requires_background(corpora):
    queries, _ = corpora
    with pytest.raises(ValueError):
        run_workflow(queries)


def test_workflow_two_different_fastas(corpora, tmp_path):
    queries, background = corpora
    res = run_workflow(queries, seq2file=background, background=background,
                       k=2, outdir=str(tmp_path / "x"), subset_size=100,
                       seed=1)
    assert res["pearson"].shape == (21, 111)
    assert (tmp_path / "x" / "counts2.csv").exists()


def test_workflow_leiden_stage(corpora, tmp_path):
    """--leiden appends community detection equal to running the graph
    module directly on the workflow's similarity matrix."""
    queries, background = corpora
    out = tmp_path / "out_leiden"
    res = run_workflow(queries, background=background, k=2,
                       outdir=str(out), subset_size=10 ** 9,
                       leiden=True, leiden_cutoff=0.1)
    memb = res["communities"]
    assert memb is not None and len(memb) == len(res["pvals"].index)

    # oracle: same thresholding + native engine on the returned sim
    from seekr_tpu.graph.kmer_leiden import leiden_membership
    gmat = np.asarray(res["pearson"], dtype=np.float64).copy()
    gmat[gmat < 0.1] = 0.0
    np.fill_diagonal(gmat, 0.0)
    gdf = pd.DataFrame(gmat, index=res["pvals"].index,
                       columns=res["pvals"].index)
    expected = leiden_membership(gdf, algo="RBERVertexPartition", rs=1.0,
                                 setseed=True)
    assert np.array_equal(memb, expected)

    # artifact: labeled communities.csv round-trips
    df = pd.read_csv(out / "communities.csv")
    assert list(df.columns) == ["Id", "Community"]
    assert df.shape[0] == len(memb)
    assert np.array_equal(df["Community"].to_numpy(), memb)


def test_workflow_leiden_skipped_for_cross_comparison(corpora, tmp_path,
                                                      capsys):
    queries, background = corpora
    res = run_workflow(queries, seq2file=background,
                       background=background, k=2,
                       outdir=str(tmp_path / "out_cross"),
                       subset_size=10 ** 9, leiden=True)
    assert res["communities"] is None
    assert "leiden stage skipped" in capsys.readouterr().out
    assert not (tmp_path / "out_cross" / "communities.csv").exists()


def test_workflow_leiden_cli_flags(corpora, tmp_path, monkeypatch):
    queries, background = corpora
    monkeypatch.chdir(tmp_path)
    main(["pipeline", queries, "-b", background, "-k", "2",
          "--leiden", "-lc", "0.1", "-o", "cli_leiden"])
    assert (tmp_path / "cli_leiden" / "communities.csv").exists()


def test_workflow_leiden_bad_algo_raises_before_any_work(corpora, tmp_path):
    queries, background = corpora
    with pytest.raises(ValueError, match="leiden_algo must be one of"):
        run_workflow(queries, background=background, k=2,
                     outdir=str(tmp_path / "never"),
                     leiden=True, leiden_algo="RBERVertexPartion")  # typo
    # validation fired before any stage: nothing was written
    assert not (tmp_path / "never").exists()


def test_workflow_leiden_realpath_self_comparison(corpora, tmp_path):
    """'./q.fa' vs 'q.fa' is still a self comparison: leiden runs and the
    second counter is not rebuilt."""
    import os

    queries, background = corpora
    alt_spelling = os.path.join(os.path.dirname(queries), ".",
                                os.path.basename(queries))
    res = run_workflow(queries, seq2file=alt_spelling,
                       background=background, k=2,
                       outdir=str(tmp_path / "out_alt"),
                       subset_size=10 ** 9, leiden=True, leiden_cutoff=0.1)
    assert res["communities"] is not None
    assert res["counts2"] is res["counts1"]
