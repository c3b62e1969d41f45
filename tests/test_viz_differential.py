"""Differential viz tests: semantic figure content vs the live reference.

Pixel comparison is meaningless (the bundled font differs by license),
so these tests intercept the DATA each implementation hands to the
shared plotting stack — the clustered matrix given to seaborn.heatmap,
the linkage matrix and labels given to scipy dendrogram, the melted
frames given to seaborn.barplot, and the per-character text placements
of the textplots — and assert both sides pass identical content.

seaborn entry points are late-bound (``sns.heatmap(...)`` resolves at
call time), so one global monkeypatch intercepts both packages; the
reference's from-imports of scipy functions are patched on the
reference module object, ours resolve at call time from
scipy.cluster.hierarchy.
"""

import os
import sys

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_viz():
    if os.environ.get("SEEKR_TPU_FORCE_LOCAL_FIXTURES"):
        pytest.skip("bare-clone reproduction (SEEKR_TPU_FORCE_LOCAL_FIXTURES)")
    sys.path.insert(0, REFERENCE)
    try:
        from seekr.kmer_count_barplot import \
            kmer_count_barplot as ref_count_barplot
        from seekr.kmer_dendrogram import kmer_dendrogram as ref_dendrogram
        from seekr.kmer_heatmap import kmer_heatmap as ref_heatmap
        from seekr.kmer_msd_barplot import kmer_msd_barplot as ref_msd
    except ImportError:
        pytest.skip("reference viz not importable")
    finally:
        sys.path.remove(REFERENCE)
    return {"heatmap": ref_heatmap, "dendrogram": ref_dendrogram,
            "count_barplot": ref_count_barplot, "msd_barplot": ref_msd}


@pytest.fixture
def sim_df():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(9, 40))
    sim = np.corrcoef(x).astype(np.float64)
    names = [f"seq{i}" for i in range(9)]
    return pd.DataFrame(sim, index=names, columns=names)


@pytest.fixture
def norm_fixture(ref_data, tmp_path):
    from seekr_tpu.models.counter import KmerCounter

    fa = str(ref_data.parent / "ldseq.fa")
    counter = KmerCounter(fa, k=2, silent=True)
    counter.get_counts()
    mean, std = tmp_path / "mean.npy", tmp_path / "std.npy"
    np.save(mean, counter.mean)
    np.save(std, np.where(np.asarray(counter.std) == 0, 1,
                          counter.std))
    return fa, str(mean), str(std)


def _capture_seaborn(monkeypatch, name):
    import seaborn

    calls = []
    orig = getattr(seaborn, name)

    def recorder(*args, **kwargs):
        data = kwargs.get("data", args[0] if args else None)
        calls.append({"data": (data.copy() if hasattr(data, "copy")
                               else data),
                      "kwargs": {k: v for k, v in kwargs.items()
                                 if k in ("vmin", "vmax", "x", "y", "hue")}})
        return orig(*args, **kwargs)

    monkeypatch.setattr(seaborn, name, recorder)
    return calls


def test_heatmap_clustered_content_matches_reference(ref_viz, sim_df,
                                                     tmp_path, monkeypatch,
                                                     capsys):
    from seekr_tpu.viz.kmer_heatmap import kmer_heatmap

    calls = _capture_seaborn(monkeypatch, "heatmap")
    monkeypatch.chdir(tmp_path)
    kmer_heatmap(sim_df, datamin=-1, datamax=1,
                 outputname=str(tmp_path / "ours"), hformat="png")
    ref_viz["heatmap"](sim_df, datamin=-1, datamax=1,
                       outputname=str(tmp_path / "ref"), hformat="png")
    capsys.readouterr()
    assert len(calls) == 2
    ours, ref = calls[0]["data"], calls[1]["data"]
    # identical clustering: the sim values are pairwise-distinct, so
    # equal matrices imply the same leaf order on both axes (one side
    # passes a plain ndarray, so labels aren't comparable directly)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-12)
    if hasattr(ours, "index") and hasattr(ref, "index"):
        assert list(ours.index) == list(ref.index)
        assert list(ours.columns) == list(ref.columns)
    assert calls[0]["kwargs"] == calls[1]["kwargs"]


@pytest.mark.parametrize("direction", ["row", "column"])
def test_dendrogram_linkage_matches_reference(ref_viz, sim_df, tmp_path,
                                              monkeypatch, capsys,
                                              direction):
    import importlib

    import scipy.cluster.hierarchy as sch

    ref_mod = importlib.import_module("seekr.kmer_dendrogram")
    captured = []
    orig = sch.dendrogram

    def recorder(link, **kwargs):
        captured.append((np.array(link), list(kwargs.get("labels", []))))
        return orig(link, **kwargs)

    # ours resolves at call time from the scipy module; the reference
    # bound the name at import, so patch its module attribute as well
    monkeypatch.setattr(sch, "dendrogram", recorder)
    monkeypatch.setattr(ref_mod, "dendrogram", recorder)

    from seekr_tpu.viz.kmer_dendrogram import kmer_dendrogram

    monkeypatch.chdir(tmp_path)
    kmer_dendrogram(sim_df, dendro_direct=direction,
                    outputname=str(tmp_path / "ours"), pformat="png")
    ref_viz["dendrogram"](sim_df, dendro_direct=direction,
                          outputname=str(tmp_path / "ref"), pformat="png")
    capsys.readouterr()
    assert len(captured) == 2
    (link_o, labels_o), (link_r, labels_r) = captured
    np.testing.assert_allclose(link_o, link_r, rtol=1e-9, atol=1e-12)
    assert labels_o == labels_r


def test_count_barplot_melted_frame_matches_reference(ref_viz, norm_fixture,
                                                      tmp_path, monkeypatch,
                                                      capsys):
    from seekr_tpu.viz.kmer_count_barplot import kmer_count_barplot

    fa, mean, std = norm_fixture
    calls = _capture_seaborn(monkeypatch, "barplot")
    monkeypatch.chdir(tmp_path)
    kmer_count_barplot(fa, mean, std, 2,
                       outputname=str(tmp_path / "ours"), pformat="png")
    ref_viz["count_barplot"](fa, mean, std, 2,
                             outputname=str(tmp_path / "ref"),
                             pformat="png")
    capsys.readouterr()
    assert len(calls) == 2
    ours, ref = calls[0]["data"], calls[1]["data"]
    assert list(ours.columns) == list(ref.columns)
    assert list(ours["Kword"]) == list(ref["Kword"])
    assert list(ours["Sample"]) == list(ref["Sample"])
    np.testing.assert_allclose(ours["Value"].to_numpy(),
                               ref["Value"].to_numpy(), rtol=1e-4,
                               atol=1e-4)
    assert calls[0]["kwargs"] == calls[1]["kwargs"]


def test_msd_barplot_melted_frame_matches_reference(ref_viz, norm_fixture,
                                                    tmp_path, monkeypatch,
                                                    capsys):
    from seekr_tpu.viz.kmer_msd_barplot import kmer_msd_barplot

    fa, mean, std = norm_fixture
    calls = _capture_seaborn(monkeypatch, "barplot")
    monkeypatch.chdir(tmp_path)
    kmer_msd_barplot(fa, mean, std, 2,
                     outputname=str(tmp_path / "ours"), pformat="png")
    ref_viz["msd_barplot"](fa, mean, std, 2,
                           outputname=str(tmp_path / "ref"), pformat="png")
    capsys.readouterr()
    assert len(calls) == 2
    ours, ref = calls[0]["data"], calls[1]["data"]
    assert list(ours["Kword"]) == list(ref["Kword"])
    np.testing.assert_allclose(ours["Value"].to_numpy(),
                               ref["Value"].to_numpy(), rtol=1e-4,
                               atol=1e-4)


def test_comp_textplot_placements_match_reference(ref_data, tmp_path,
                                                  monkeypatch, capsys):
    """Per-character text placements (position, glyph, color) of the
    comparative textplot match the reference's rendering loop."""
    import importlib

    from matplotlib.axes import Axes

    sys.path.insert(0, REFERENCE)
    try:
        ref_mod = importlib.import_module("seekr.kmer_comp_textplot")
    finally:
        sys.path.remove(REFERENCE)
    from seekr_tpu.viz.textplot import kmer_comp_textplot

    records = []
    orig_text = Axes.text

    def recorder(self, x, y, s, *args, **kwargs):
        records.append((float(x), float(y), str(s),
                        str(kwargs.get("color", ""))))
        return orig_text(self, x, y, s, *args, **kwargs)

    monkeypatch.setattr(Axes, "text", recorder)
    monkeypatch.chdir(tmp_path)
    fa = str(ref_data / "example.fa")
    words = ["AAAA", "GTGT"]
    kmer_comp_textplot(fa, fa, words, outputname=str(tmp_path / "ours"),
                       plotformat="png")
    ours = records[:]
    records.clear()
    ref_mod.kmer_comp_textplot(fa, fa, words,
                               outputname=str(tmp_path / "ref"),
                               plotformat="png")
    capsys.readouterr()
    assert len(ours) == len(records)
    # draw ORDER differs between the implementations (same figure);
    # compare the placement SETS with rounded coordinates
    canon = lambda rs: sorted((round(x, 9), round(y, 9), s, c)
                              for x, y, s, c in rs)
    assert canon(ours) == canon(records)


def test_indi_textplot_placements_match_reference(ref_data, tmp_path,
                                                  monkeypatch, capsys):
    """Per-sequence individual textplots place identical glyph/color sets
    at identical coordinates (one figure per sequence; files land in the
    given outputpath)."""
    import importlib

    from matplotlib.axes import Axes

    sys.path.insert(0, REFERENCE)
    try:
        ref_mod = importlib.import_module("seekr.kmer_indi_textplot")
    finally:
        sys.path.remove(REFERENCE)
    from seekr_tpu.viz.textplot import kmer_indi_textplot

    records = []
    orig_text = Axes.text

    def recorder(self, x, y, s, *args, **kwargs):
        records.append((float(x), float(y), str(s),
                        str(kwargs.get("color", ""))))
        return orig_text(self, x, y, s, *args, **kwargs)

    monkeypatch.setattr(Axes, "text", recorder)
    fa = str(ref_data / "example.fa")
    words = ["ATTA", "GGGG"]
    out_o = tmp_path / "ours"
    out_r = tmp_path / "ref"
    out_o.mkdir()
    out_r.mkdir()
    kmer_indi_textplot(fa, words, outputpath=str(out_o) + "/",
                       plotformat="png")
    ours = records[:]
    records.clear()
    ref_mod.kmer_indi_textplot(fa, words, outputpath=str(out_r) + "/",
                               plotformat="png")
    capsys.readouterr()
    assert len(ours) == len(records)
    canon = lambda rs: sorted((round(x, 9), round(y, 9), s, c)
                              for x, y, s, c in rs)
    assert canon(ours) == canon(records)
    assert sorted(p.name for p in out_o.iterdir()) == \
        sorted(p.name for p in out_r.iterdir())
