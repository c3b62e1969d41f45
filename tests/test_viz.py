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
