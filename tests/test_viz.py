"""Smoke + behavior tests for the visualization layer.

Plots are rendered to files in tmp dirs (Agg backend); behavioral logic
(word coordinates, color assignment, colormap construction, sort orders)
is unit-tested directly.
"""

import numpy as np
import pandas as pd
import pytest

from seekr_tpu.models.counter import KmerCounter
from seekr_tpu.viz import (kmer_comp_textplot, kmer_count_barplot,
                           kmer_dendrogram, kmer_heatmap, kmer_indi_textplot,
                           kmer_msd_barplot)
from seekr_tpu.viz.kmer_heatmap import make_cmap
from seekr_tpu.viz.style import check_hex_colors, is_hex_color
from seekr_tpu.viz.textplot import ass_color, find_word_coordinates


@pytest.fixture(scope="module")
def sim_df():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 8))
    sim = np.corrcoef(x)
    names = [f"seq{i}" for i in range(8)]
    return pd.DataFrame(sim, index=names, columns=names)


@pytest.fixture(scope="module")
def norm_vectors(ref_data, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("viz")
    fa = str(ref_data.parent / "ldseq.fa")
    counter = KmerCounter(fa, k=2, silent=True)
    counter.get_counts()
    mean, std = tmp / "mean.npy", tmp / "std.npy"
    np.save(mean, counter.mean)
    np.save(std, counter.std)
    return fa, str(mean), str(std)


def test_hex_color_validation():
    assert is_hex_color("#1b7837")
    assert not is_hex_color("1b7837")
    assert not is_hex_color("#1b78")
    assert not is_hex_color("#1b7837ff")
    assert check_hex_colors(["#000000", "#ffffff"])
    assert not check_hex_colors(["#000000", "nope"])


def test_make_cmap_threshold_pivot():
    cmap = make_cmap(["#000000", "#ffffff", "#ff0000"], thresh_value=0.05,
                     datamin=0.0, datamax=1.0)
    # color at the pivot fraction is the middle color
    r, g, b, _ = cmap(0.05)
    # 256-bin quantization of the colormap leaves ~6% slack at the pivot
    assert abs(r - 1) < 0.1 and abs(g - 1) < 0.1 and abs(b - 1) < 0.1


def test_make_cmap_invalid_falls_back(capsys):
    cmap = make_cmap(["bad"], 0.5, 0, 1)
    assert "default color_range" in capsys.readouterr().out
    assert cmap is not None


def test_find_word_coordinates_overlapping():
    # AAA in AAAAA: occurrences at 0,1,2 -> coords 0..4
    np.testing.assert_array_equal(find_word_coordinates("AAAAA", "AAA"),
                                  [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(find_word_coordinates("GATTA", "TT"), [2, 3])
    assert len(find_word_coordinates("GGGG", "AT")) == 0


def test_ass_color_first_word_priority():
    matched = [np.array([1, 2]), np.array([2, 3])]
    colors = ["red", "blue"]
    assert ass_color(2, matched, colors) == "red"
    assert ass_color(3, matched, colors) == "blue"
    assert ass_color(9, matched, colors) is None


def test_kmer_heatmap_clustered_and_flat(sim_df, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    kmer_heatmap(sim_df, datamin=-1, datamax=1, outputname="hm")
    assert (tmp_path / "hm.pdf").exists()
    kmer_heatmap(sim_df, datamin=-1, datamax=1, cluster=False,
                 outputname="hm_flat", hformat="png")
    assert (tmp_path / "hm_flat.png").exists()


def test_kmer_heatmap_bad_format_falls_back(sim_df, tmp_path, monkeypatch,
                                            capsys):
    monkeypatch.chdir(tmp_path)
    kmer_heatmap(sim_df, datamin=-1, datamax=1, cluster=False,
                 outputname="hm2", hformat="bogus")
    assert (tmp_path / "hm2.pdf").exists()
    assert "not supported" in capsys.readouterr().out


def test_kmer_dendrogram_row_and_column(sim_df, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    kmer_dendrogram(sim_df, dendro_direct="row", outputname="dr")
    kmer_dendrogram(sim_df, dendro_direct="column", outputname="dc")
    assert (tmp_path / "dr.pdf").exists()
    assert (tmp_path / "dc.pdf").exists()
    # invalid direction: no file, advisory message
    kmer_dendrogram(sim_df, dendro_direct="diag", outputname="dx")
    assert not (tmp_path / "dx.pdf").exists()


def test_kmer_count_barplot(norm_vectors, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    fa, mean, std = norm_vectors
    kmer_count_barplot(fa, mean, std, k=2, outputname="cb")
    out = capsys.readouterr().out
    assert (tmp_path / "cb.pdf").exists()
    # ldseq.fa has 21 seqs -> first-10 message
    assert "more than 10 input sequences" in out
    # wrong k -> None
    assert kmer_count_barplot(fa, mean, std, k=3) is None


def test_kmer_msd_barplot(norm_vectors, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fa, mean, std = norm_vectors
    kmer_msd_barplot(fa, mean, std, k=2, sortstat="sd",
                     sortmethod="ascending", outputname="msd")
    assert (tmp_path / "msd.pdf").exists()
    assert kmer_msd_barplot(fa, mean, std, k=5) is None


def test_textplots(ref_data, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fa = str(ref_data / "example.fa")
    kmer_comp_textplot(fa, fa, words=["AAAA", "GGG"], outputname="comp")
    assert (tmp_path / "comp.pdf").exists()

    # individual plots named by header prefix before '|'
    kmer_indi_textplot(fa, words=["ATTT"], outputpath=str(tmp_path) + "/")
    pdfs = list(tmp_path.glob("*.pdf"))
    assert len(pdfs) >= 2  # comp + at least one per-sequence plot


def test_visualize_distro(tmp_path, monkeypatch, capsys):
    from seekr_tpu.viz.visualize_distro import distro_values, visualize_distro

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, size=(12, 12))
    sym = (a + a.T) / 2
    np.fill_diagonal(sym, 1.0)

    # symmetric -> strict upper triangle (no diagonal r=1 spike)
    vals = distro_values(sym)
    assert vals.size == 12 * 11 // 2
    assert not (vals == 1.0).any()
    # sub-5dp-roundoff asymmetry still counts as symmetric
    noisy = sym + rng.uniform(-1e-7, 1e-7, size=sym.shape)
    assert distro_values(noisy).size == 12 * 11 // 2
    # NaNs dropped, asymmetric -> all finite cells
    rect = rng.uniform(-1, 1, size=(5, 7))
    rect[0, 0] = np.nan
    assert distro_values(rect).size == 34

    # plot from a .npy path, then a labeled CSV via the CLI
    np.save("sim.npy", sym)
    out = visualize_distro("sim.npy", outputname="d1")
    assert (tmp_path / "d1.pdf").exists()
    assert out.size == 66

    import pandas as pd

    from seekr_tpu import cli

    labels = [f"s{i}" for i in range(12)]
    pd.DataFrame(sym, index=labels, columns=labels).to_csv("sim.csv")
    cli.console_visualize_distro(["sim.csv", "-o", "d2", "-pf", "png"])
    assert (tmp_path / "d2.png").exists()
    with pytest.raises(SystemExit):
        cli.console_visualize_distro([])
    assert "seekr_visualize_distro" in capsys.readouterr().out

    # empty input -> message, no file
    assert visualize_distro(np.full((3, 3), np.nan), outputname="d3") is None
    assert "no finite values" in capsys.readouterr().out
    assert not (tmp_path / "d3.pdf").exists()


def test_visualize_distro_streamed_matches(tmp_path, monkeypatch):
    """Streamed histogram == np.histogram of the in-memory value vector
    (bin-exact); summary stats match to accumulator precision."""
    import numpy as np

    from seekr_tpu.viz.visualize_distro import (distro_values,
                                                stream_distro_stats,
                                                visualize_distro)

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    # symmetric (triu branch) and rectangular (all-values branch)
    sym = rng.normal(0, 0.3, (40, 40)).astype(np.float32)
    sym = ((sym + sym.T) / 2)
    rect = rng.normal(0, 0.3, (17, 31)).astype(np.float32)
    rect[3, 4] = np.nan  # non-finite values are excluded in both paths
    for name, mat in (("sym", sym), ("rect", rect)):
        np.save(f"{name}.npy", mat)
        vals = distro_values(f"{name}.npy")
        counts, edges, n, mean, sd, median = stream_distro_stats(
            f"{name}.npy", bins=50, chunk_cells=64)
        assert n == vals.size
        want_counts, want_edges = np.histogram(
            vals, bins=50, range=(vals.min(), vals.max()))
        np.testing.assert_array_equal(counts, want_counts)
        np.testing.assert_allclose(edges, want_edges, rtol=1e-12)
        assert abs(mean - vals.mean()) < 1e-9
        assert abs(sd - vals.std()) < 1e-6
        # the estimate is rank-based (lower middle); np.median averages
        # the middle pair for even n — assert within that pair +- one
        # fine-bin width (negligible at streaming scale)
        srt = np.sort(vals)
        binw = (vals.max() - vals.min()) / (1 << 20)
        lo, hi = srt[(n - 1) // 2], srt[n // 2]
        assert lo - binw <= median <= hi + binw
        # forced streamed plot renders and returns the stats tuple —
        # distinguishable from the None that means "no plot produced"
        got = visualize_distro(f"{name}.npy", outputname=f"d_{name}",
                               stream=True)
        assert got is not None and got[2] == n
        assert (tmp_path / f"d_{name}.pdf").exists()


def test_visualize_distro_flag_consistency(tmp_path, monkeypatch, capsys):
    """The symmetric= hint means the same thing at every artifact size
    (review finding: it was silently ignored on the dense path), and
    stream=True on a non-.npy input raises instead of silently loading
    the whole matrix."""
    import numpy as np
    import pandas as pd
    import pytest

    from seekr_tpu.viz.visualize_distro import distro_values, visualize_distro

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(1)
    sym = rng.normal(0, 0.3, (12, 12)).astype(np.float32)
    sym = (sym + sym.T) / 2
    np.save("s.npy", sym)
    # dense path honors the explicit override exactly like streamed mode
    assert distro_values("s.npy", symmetric=False).size == 144
    assert distro_values("s.npy", symmetric=True).size == 12 * 11 // 2
    with pytest.raises(ValueError, match="square"):
        distro_values(rng.normal(size=(3, 5)), symmetric=True)
    # stream=True without a .npy path: loud refusal, not a silent load
    pd.DataFrame(sym).to_csv("s.csv")
    with pytest.raises(ValueError, match="npy"):
        visualize_distro("s.csv", stream=True)
    with pytest.raises(ValueError, match="npy"):
        visualize_distro(sym, stream=True)
