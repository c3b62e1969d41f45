"""Tests for the graph layer (kmer_leiden on the native Leiden engine)."""

import numpy as np
import pandas as pd
import pytest

from seekr_tpu import native
from seekr_tpu.graph import kmer_leiden
from seekr_tpu.graph.kmer_leiden import (leiden_membership, similarity_graph)
from seekr_tpu.models.counter import KmerCounter

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def norm_vectors(ref_data, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("leiden")
    fa = str(ref_data.parent / "ldseq.fa")
    counter = KmerCounter(fa, k=2, silent=True)
    counter.get_counts()
    mean, std = tmp / "mean.npy", tmp / "std.npy"
    np.save(mean, counter.mean)
    np.save(std, counter.std)
    return fa, str(mean), str(std)


def test_similarity_graph_shape_and_zero_diag(norm_vectors):
    fa, mean, std = norm_vectors
    df = similarity_graph(fa, mean, std, k=2, pearsoncutoff=0.1)
    assert df.shape == (21, 21)
    assert np.all(np.diag(df.values) == 0)
    assert (df.values >= 0.1).sum() + (df.values == 0).sum() == df.size
    # symmetric labels from headers without '>'
    assert list(df.index) == list(df.columns)
    assert not any(h.startswith(">") for h in df.index)


def test_kmer_leiden_end_to_end(norm_vectors, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fa, mean, std = norm_vectors
    membership = kmer_leiden(fa, mean, std, k=2, algo="RBERVertexPartition",
                             setseed=True, plotname="net", csvfile="out")
    assert membership is not None and len(membership) == 21
    assert (tmp_path / "net.pdf").exists()
    nodes = pd.read_csv(tmp_path / "out_nodes_leiden.csv")
    edges = pd.read_csv(tmp_path / "out_edges_leiden.csv")
    assert list(nodes.columns) == ["Id", "Label", "Color"]
    assert list(edges.columns) == ["Source", "Target", "Weight"]
    assert len(nodes) == 21
    assert nodes["Color"].min() == 1  # 1-based community ids
    assert len(edges) == 21 * 20 // 2


def test_kmer_leiden_seeded_reproducible(norm_vectors):
    fa, mean, std = norm_vectors
    a = kmer_leiden(fa, mean, std, k=2, setseed=True)
    b = kmer_leiden(fa, mean, std, k=2, setseed=True)
    np.testing.assert_array_equal(a, b)


def test_kmer_leiden_wrong_k_returns_none(norm_vectors, capsys):
    fa, mean, std = norm_vectors
    assert kmer_leiden(fa, mean, std, k=3) is None
    assert "not compatible" in capsys.readouterr().out


def test_all_algorithms_run(norm_vectors):
    fa, mean, std = norm_vectors
    df = similarity_graph(fa, mean, std, k=2)
    for algo in native.ALGORITHMS:
        m = leiden_membership(df, algo=algo, rs=1.0, setseed=True)
        assert len(m) == 21


def test_threshold_edge_style(norm_vectors, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fa, mean, std = norm_vectors
    membership = kmer_leiden(fa, mean, std, k=2, setseed=True,
                             edgecolormethod="threshold", plotname="thr")
    assert (tmp_path / "thr.pdf").exists()
    assert membership is not None


def test_edge_style_gradient_no_edges():
    # every pair below the cutoff: styling must return empties, not crash
    import pandas as pd

    from seekr_tpu.graph.kmer_leiden import _edge_style

    df = pd.DataFrame(np.zeros((4, 4)), index=list("abcd"), columns=list("abcd"))
    colors, widths = _edge_style(df, "gradient", 0.1)
    assert colors == [] and widths == []


def test_streamed_edges_match_dense(norm_vectors):
    """sparse_similarity_edges == the dense path's thresholded triu
    edge set (same src/dst/weights), for positive and zero cutoffs."""
    from seekr_tpu.graph.kmer_leiden import sparse_similarity_edges

    fa, mean, std = norm_vectors
    for cutoff in (0.0, 0.15):
        df = similarity_graph(fa, mean, std, k=2, pearsoncutoff=cutoff)
        vals = df.values
        want_src, want_dst = np.nonzero(np.triu(vals > 0, k=1))

        counter = KmerCounter(fa, mean=mean, std=std, k=2, silent=True)
        src, dst, w = sparse_similarity_edges(
            counter.get_counts_device(), pearsoncutoff=cutoff,
            block_rows=5)  # forces multiple tiles
        order = np.lexsort((dst, src))
        src, dst, w = src[order], dst[order], w[order]
        np.testing.assert_array_equal(src, want_src)
        np.testing.assert_array_equal(dst, want_dst)
        np.testing.assert_allclose(w, vals[want_src, want_dst],
                                   rtol=1e-5, atol=1e-7)


def test_streamed_membership_matches_dense(norm_vectors, tmp_path,
                                           monkeypatch, capsys):
    """kmer_leiden(stream=True): same membership as the dense path
    (seeded), Gephi CSVs written from the detected edge set, plot
    skipped with an actionable message."""
    monkeypatch.chdir(tmp_path)
    fa, mean, std = norm_vectors
    dense = kmer_leiden(fa, mean, std, k=2, setseed=True,
                        pearsoncutoff=0.1)
    streamed = kmer_leiden(fa, mean, std, k=2, setseed=True,
                           pearsoncutoff=0.1, stream=True,
                           plotname="net_s", csvfile="st")
    np.testing.assert_array_equal(streamed, dense)
    assert "skips the spring-layout plot" in capsys.readouterr().out
    assert not (tmp_path / "net_s.pdf").exists()
    nodes = pd.read_csv(tmp_path / "st_nodes_leiden.csv")
    edges = pd.read_csv(tmp_path / "st_edges_leiden.csv")
    assert len(nodes) == 21 and list(nodes.columns) == ["Id", "Label",
                                                        "Color"]
    # detected edge set only (not the reference's every-triu-cell melt)
    assert (edges["Weight"] > 0).all()
    assert list(edges.columns) == ["Source", "Target", "Weight"]


def test_streamed_mesh_membership(norm_vectors):
    """data_parallel: streamed edge extraction over a virtual mesh gives
    the same seeded membership."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    fa, mean, std = norm_vectors
    dense = kmer_leiden(fa, mean, std, k=2, setseed=True,
                        pearsoncutoff=0.1)
    sharded = kmer_leiden(fa, mean, std, k=2, setseed=True,
                          pearsoncutoff=0.1, data_parallel=4)
    np.testing.assert_array_equal(sharded, dense)


def test_dense_path_honors_mesh(norm_vectors):
    """stream=False with data_parallel must run the GEMM data-sharded,
    not silently ignore the mesh (review finding); memberships match
    the plain dense path."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    fa, mean, std = norm_vectors
    dense = kmer_leiden(fa, mean, std, k=2, setseed=True,
                        pearsoncutoff=0.1)
    meshy = kmer_leiden(fa, mean, std, k=2, setseed=True,
                        pearsoncutoff=0.1, stream=False, data_parallel=4)
    np.testing.assert_array_equal(meshy, dense)
