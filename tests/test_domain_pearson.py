"""DomainPearson — sliding-window query-vs-target domain similarity.

The legacy surface has no shipped reference tests (its test class is an
empty TODO, /root/reference/seekr/tests/test_pearson.py:27-29), so these
tests pin the reconstruction's own documented contract: tiling geometry,
oracle equality of the batched device path against a per-window
reimplementation, percentile semantics vs scipy, and the CSV/CLI
artifacts.
"""

import numpy as np
import pandas as pd
import pytest
from scipy import stats as scipy_stats

from seekr_tpu.models.domain import (DomainPearson, percentile_of_scores,
                                     tile_windows)


def write_fasta(path, seqs, prefix="SEQ"):
    with open(path, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">{prefix}{i}|meta{i}|\n{s}\n")


def rand_seq(rng, n):
    return "".join(np.array(list("AGTC"))[rng.integers(0, 4, size=n)])


# -- tiling ------------------------------------------------------------------

def test_tile_windows_geometry():
    seq = "A" * 10
    # exact fit: starts 0..6 step 3 -> 0, 3, 6 (6+4 == 10)
    tiles = tile_windows(seq, window=4, slide=3)
    assert [t[0] for t in tiles] == [0, 3, 6]
    assert all(len(t[1]) == 4 for t in tiles)
    # trailing bases past the last full window are dropped
    tiles = tile_windows("A" * 11, window=4, slide=3)
    assert [t[0] for t in tiles] == [0, 3, 6]
    # shorter than window -> one whole-sequence window
    assert tile_windows("AGT", window=4, slide=3) == [(0, "AGT")]
    # length == window -> one window
    assert tile_windows("AGTC", window=4, slide=3) == [(0, "AGTC")]
    with pytest.raises(ValueError):
        tile_windows("AGTC", window=0, slide=1)
    with pytest.raises(ValueError):
        tile_windows("AGTC", window=4, slide=0)


# -- percentile semantics ----------------------------------------------------

def test_percentile_of_scores_matches_scipy_mean_kind():
    rng = np.random.default_rng(0)
    null = rng.normal(size=200)
    null[10:20] = null[0]  # ties
    scores = np.concatenate([rng.normal(size=50), null[:5],
                             [null.min() - 1, null.max() + 1]])
    got = percentile_of_scores(null, scores)
    expected = [scipy_stats.percentileofscore(null, s, kind="mean")
                for s in scores]
    np.testing.assert_allclose(got, expected, rtol=1e-12)


# -- end-to-end oracle -------------------------------------------------------

def test_run_matches_per_window_oracle(tmp_path):
    """The batched window path must equal counting each window alone.

    Uses Log2.none so per-window and batched normalization are
    mathematically identical (Log2.post's global-min shift is
    matrix-global — faithful BasicCounter semantics — which makes the
    batch the unit of normalization by design)."""
    from seekr_tpu.models.counter import KmerCounter
    from seekr_tpu.models.pearson import pearson

    rng = np.random.default_rng(1)
    queries = [rand_seq(rng, 300), rand_seq(rng, 450)]
    targets = [rand_seq(rng, 700), rand_seq(rng, 260), rand_seq(rng, 90)]
    refs = [rand_seq(rng, 400) for _ in range(6)]
    qp, tp, rp = (tmp_path / n for n in ("q.fa", "t.fa", "r.fa"))
    write_fasta(qp, queries, "Q")
    write_fasta(tp, targets, "T")
    write_fasta(rp, refs, "R")

    dp = DomainPearson(query_path=str(qp), target_path=str(tp),
                       reference_path=str(rp), k=3, window=128, slide=64,
                       log2="Log2.none")
    rdf = dp.run()

    # oracle: per-window counting with the same normalization frame
    ref_counter = KmerCounter(k=3, mean=True, std=True, log2="Log2.none",
                              silent=True)
    ref_counter.seqs = list(refs)
    ref_counter.get_counts()
    mean, std = ref_counter.mean, ref_counter.std

    def profile(seqs):
        c = KmerCounter(k=3, mean=mean, std=std, log2="Log2.none",
                        silent=True)
        c.seqs = list(seqs)
        return c.get_counts()

    qc = profile(queries)
    expected_rows = []
    labels = []
    for ti, t in enumerate(targets):
        for start, w in tile_windows(t, 128, 64):
            labels.append(f"T{ti}|{start}")
            expected_rows.append(pearson(profile([w]), qc)[0])
    expected = np.vstack(expected_rows)

    assert list(rdf.index) == labels
    assert list(rdf.columns) == ["Q0", "Q1"]
    np.testing.assert_allclose(rdf.to_numpy(), expected, rtol=1e-4,
                               atol=1e-5)

    # percentiles: same shape, scipy semantics against the query's null
    null = pearson(qc, profile(refs))
    for j in range(2):
        expected_pct = [scipy_stats.percentileofscore(null[j], v, kind="mean")
                        for v in rdf.to_numpy()[:, j]]
        np.testing.assert_allclose(dp.percentiles.to_numpy()[:, j],
                                   expected_pct, rtol=1e-6, atol=1e-9)


def test_run_without_reference_skips_percentiles(tmp_path):
    rng = np.random.default_rng(2)
    qp, tp = tmp_path / "q.fa", tmp_path / "t.fa"
    write_fasta(qp, [rand_seq(rng, 200), rand_seq(rng, 200)], "Q")
    write_fasta(tp, [rand_seq(rng, 500)], "T")
    dp = DomainPearson(query_path=str(qp), target_path=str(tp), k=2,
                       window=100, slide=50)
    rdf = dp.run()
    assert dp.percentiles is None
    assert rdf.shape == (9, 2)  # starts 0..400 step 50
    assert np.isfinite(rdf.to_numpy()).all()


def test_single_window_basis_with_std_raises(tmp_path):
    """A one-window normalization basis cannot be standardized.

    Mirrors KmerCounter's single-sequence guard: without a reference,
    one short target yields one window, population std over one row is
    all zeros, and the run must fail loudly instead of emitting NaNs."""
    rng = np.random.default_rng(7)
    qp, tp = tmp_path / "q.fa", tmp_path / "t.fa"
    write_fasta(qp, [rand_seq(rng, 200)], "Q")
    write_fasta(tp, [rand_seq(rng, 300)], "T")  # < window+slide -> 1 window
    dp = DomainPearson(query_path=str(qp), target_path=str(tp), k=2,
                       window=1000, slide=100)
    with pytest.raises(ValueError, match="standardize a single"):
        dp.run()
    # raw counts (mean=False, std=False) make the same inputs legal
    # (mean=True would center the lone window by itself -> zero-variance
    # profile -> NaN r, so raw counts are the meaningful fallback)
    dp = DomainPearson(query_path=str(qp), target_path=str(tp), k=2,
                       window=1000, slide=100, mean=False, std=False)
    assert np.isfinite(dp.run().to_numpy()).all()


def test_percentiles_path_without_reference_warns(tmp_path, capsys):
    rng = np.random.default_rng(8)
    qp, tp = tmp_path / "q.fa", tmp_path / "t.fa"
    write_fasta(qp, [rand_seq(rng, 200), rand_seq(rng, 200)], "Q")
    write_fasta(tp, [rand_seq(rng, 500)], "T")
    pct = tmp_path / "pct.csv"
    dp = DomainPearson(query_path=str(qp), target_path=str(tp), k=2,
                       window=100, slide=50, percentiles_path=str(pct))
    dp.run()
    assert "without" in capsys.readouterr().out
    assert dp.percentiles is None and not pct.exists()


def test_each_set_counted_exactly_once(tmp_path, monkeypatch):
    """run() does one device count pass per sequence set (the module's
    'ONE device count pass' contract): queries, windows, and the
    optional reference are each counted once, including when the
    normalization frame is derived from them."""
    from seekr_tpu.models import counter as counter_mod

    rng = np.random.default_rng(9)
    qp, tp, rp = (tmp_path / n for n in ("q.fa", "t.fa", "r.fa"))
    write_fasta(qp, [rand_seq(rng, 200)], "Q")
    write_fasta(tp, [rand_seq(rng, 500)], "T")
    write_fasta(rp, [rand_seq(rng, 250) for _ in range(4)], "R")

    calls = []
    orig = counter_mod.KmerCounter._raw_counts
    monkeypatch.setattr(counter_mod.KmerCounter, "_raw_counts",
                        lambda self: calls.append(len(self.seqs)) or orig(self))

    DomainPearson(query_path=str(qp), target_path=str(tp),
                  reference_path=str(rp), k=2, window=100, slide=50).run()
    assert calls == [1, 9, 4]  # queries, windows, reference — once each

    calls.clear()
    DomainPearson(query_path=str(qp), target_path=str(tp), k=2,
                  window=100, slide=50).run()
    assert calls == [1, 9]  # frame derived from windows without a re-count


def test_explicit_norm_vectors_and_artifacts(tmp_path):
    rng = np.random.default_rng(3)
    qp, tp = tmp_path / "q.fa", tmp_path / "t.fa"
    write_fasta(qp, [rand_seq(rng, 200)], "Q")
    write_fasta(tp, [rand_seq(rng, 300)], "T")
    mean = rng.random(16).astype(np.float32)
    std = (rng.random(16) + 0.5).astype(np.float32)
    np.save(tmp_path / "mean.npy", mean)
    np.save(tmp_path / "std.npy", std)
    out = tmp_path / "r.csv"
    dp = DomainPearson(query_path=str(qp), target_path=str(tp),
                       mean=str(tmp_path / "mean.npy"),
                       std=str(tmp_path / "std.npy"),
                       r_values_path=str(out), k=2, window=150, slide=150)
    rdf = dp.run()
    np.testing.assert_array_equal(dp.mean, mean)
    back = pd.read_csv(out, index_col=0)
    np.testing.assert_allclose(back.to_numpy(), rdf.to_numpy(), rtol=1e-6)
    assert list(back.index) == list(rdf.index)


def test_cli_domain_pearson(tmp_path, monkeypatch, capsys):
    from seekr_tpu import cli

    rng = np.random.default_rng(4)
    monkeypatch.chdir(tmp_path)
    write_fasta("q.fa", [rand_seq(rng, 150), rand_seq(rng, 220)], "Q")
    write_fasta("t.fa", [rand_seq(rng, 400)], "T")
    write_fasta("ref.fa", [rand_seq(rng, 250) for _ in range(4)], "R")
    cli.console_domain_pearson([
        "q.fa", "t.fa", "-r", "ref.fa", "-rp", "rv.csv", "-pp", "pct.csv",
        "-k", "2", "-w", "128", "-sl", "64"])
    rv = pd.read_csv("rv.csv", index_col=0)
    pct = pd.read_csv("pct.csv", index_col=0)
    assert rv.shape == pct.shape == (5, 2)
    assert ((pct.to_numpy() >= 0) & (pct.to_numpy() <= 100)).all()
    # bare invocation prints usage and exits
    with pytest.raises(SystemExit):
        cli.console_domain_pearson([])
    assert "seekr_domain_pearson" in capsys.readouterr().out


def test_percentile_nan_semantics():
    """NaN scores yield NaN percentiles (scipy behavior) instead of a
    fake 100th-percentile hit, and NaN null entries are excluded from
    the ranking denominator (review finding)."""
    from seekr_tpu.models.domain import percentile_of_scores

    null = np.array([0.1, 0.2, np.nan, 0.3, 0.4])
    scores = np.array([0.35, np.nan, 0.5])
    got = percentile_of_scores(null, scores)
    assert np.isnan(got[1])
    assert got[0] == 75.0   # 3 of 4 finite nulls below
    assert got[2] == 100.0  # above every finite null despite the NaN


def test_window_labels_deduplicate_shared_short_names(tmp_path):
    """Two targets sharing a pre-'|' short name get pandas-mangle
    suffixes so window labels never collide (review finding)."""
    from seekr_tpu.models.domain import DomainPearson

    fa = tmp_path / "t.fa"
    fa.write_text(">chr1|assemblyA\n" + "AGTC" * 40 + "\n"
                  ">chr1|assemblyB\n" + "CCCC" * 40 + "\n")
    q = tmp_path / "q.fa"
    q.write_text(">q1\n" + "AGTC" * 30 + "\n")
    dp = DomainPearson(str(q), str(fa), mean=False, std=False,
                       log2="Log2.none", k=2, window=80, slide=80)
    dp.split_targets()
    assert dp.target_names == ["chr1", "chr1.1"]
    assert len(set(dp.window_labels)) == len(dp.window_labels)
