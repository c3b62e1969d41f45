"""Leiden community network for fasta sequences.

Behavioral parity with seekr/kmer_leiden.py:66-346 — counts + self-Pearson on
TPU, r < cutoff and the diagonal zeroed, undirected weighted graph, Leiden
partition, spring-layout pdf plot (gradient or threshold edge coloring), and
Gephi-ready nodes/edges CSV export — but community detection runs in this
framework's own native C++ Leiden engine (seekr_tpu/native/src/leiden.cpp)
instead of python-igraph + libleidenalg, with the same six partition types
and resolution/seed semantics (seekr/kmer_leiden.py:115-146: seed=1 when
setseed, resolution only for RBConfiguration/RBER/CPM).
"""

from __future__ import annotations

import numpy as np

from seekr_tpu import native
from seekr_tpu.models.counter import KmerCounter
from seekr_tpu.models.pearson import pearson

# Auto-stream cutover for kmer_leiden (cells of the self-similarity
# square).  Deliberately far above io.stream.STREAM_CELL_THRESHOLD:
# streaming CHANGES user-visible artifacts (the spring plot is skipped,
# the Gephi edges file holds the detected set instead of the full triu
# melt), so it must not kick in while the dense path is still
# comfortable — 2.5e9 cells = m=50k = a 10 GB float32 matrix.  Force
# earlier with stream=True / --stream on.
LEIDEN_STREAM_CELL_THRESHOLD = 2_500_000_000

# partition types whose find_partition call takes resolution_parameter
# (reference kmer_leiden.py:131-146)
_RESOLUTION_ALGOS = {
    "RBConfigurationVertexPartition",
    "RBERVertexPartition",
    "CPMVertexPartition",
}


def similarity_graph(inputfile, mean, std, k, pearsoncutoff=0,
                     counter=None, mesh=None):
    """Thresholded self-similarity DataFrame (headers as labels).

    r < pearsoncutoff -> 0; diagonal -> 0 (reference kmer_leiden.py:93-96).
    ``counter`` reuses an already-parsed KmerCounter for the same file;
    ``mesh`` runs the O(m^2) GEMM data-sharded (the matrix is still
    materialized on host — the streamed path avoids that too).
    """
    import pandas as pd

    if counter is None:
        counter = KmerCounter(inputfile, mean=mean, std=std, k=k,
                              silent=True)
    headers = [h[1:] for h in counter.headers]  # counter already parsed
    # counts stay device-resident into Pearson (the reference's
    # make_count_file writes nothing here — no outfile); only the
    # [m, m] similarity matrix crosses to the host
    counts = counter.get_counts_device()
    if mesh is not None:
        from seekr_tpu.ops.pearson import _RowFiller
        from seekr_tpu.parallel.dist import stream_pearson_sharded

        # preallocate + fill in place: collecting tiles and vstacking
        # would transiently hold the matrix twice (13 GB extra at the
        # m=40k dense comfort ceiling)
        m = int(counts.shape[0])
        sim = np.empty((m, m), dtype=np.float32)
        stream_pearson_sharded(mesh, counts, _RowFiller(sim))
        # exact self-similarity symmetry like the non-mesh path (the
        # edge builder reads only the strict triu, but the returned
        # frame is user-visible and must not carry retiling asymmetry)
        from seekr_tpu.models.pearson import mirror_upper_inplace

        mirror_upper_inplace(sim)
    else:
        sim = np.asarray(pearson(counts, counts)).copy()
    sim[sim < pearsoncutoff] = 0
    np.fill_diagonal(sim, 0)
    return pd.DataFrame(sim, columns=headers, index=headers)


def _run_leiden(src, dst, weights, n_nodes, algo, rs, setseed):
    """Native Leiden on an explicit undirected edge list."""
    if algo not in native.ALGORITHMS:
        raise ValueError(
            f"algo must be one of {list(native.ALGORITHMS)}, got {algo!r}")
    # Significance is defined for unweighted graphs only; the reference runs
    # it without weights (kmer_leiden.py:131-134) — every edge counts as 1
    if algo == "SignificanceVertexPartition":
        weights = None
    elif weights is not None:
        weights = np.asarray(weights, np.float64)
    resolution = rs if algo in _RESOLUTION_ALGOS else 1.0
    seed = 1 if setseed else None
    return native.leiden(np.asarray(src, np.int64),
                         np.asarray(dst, np.int64), weights,
                         n_nodes=n_nodes, algo=algo,
                         resolution=resolution, seed=seed)


def leiden_membership(df, algo="RBERVertexPartition", rs=1.0, setseed=False):
    """Run the native Leiden engine on a thresholded similarity DataFrame."""
    vals = df.values
    src, dst = np.nonzero(np.triu(vals > 0, k=1))
    return _run_leiden(src, dst, vals[src, dst], vals.shape[0], algo, rs,
                       setseed)


class _EdgeTiles:
    """Streamed thresholded edge extraction from self-similarity tiles.

    Keeps only the strict-upper entries passing the reference's edge rule
    — ``sim[sim < cutoff] = 0`` then ``> 0`` (kmer_leiden.py:93-96,106),
    i.e. ``r >= cutoff and r > 0`` — as the [block, m] tiles come off the
    device, so host memory holds the SPARSE edge set instead of the
    [m, m] square (130 GB float32 at the 180k extreme; the edge set at
    any useful cutoff is orders of magnitude smaller and directly what
    community detection consumes).
    """

    def __init__(self, m: int, cutoff: float):
        self.m = int(m)
        self.cutoff = cutoff
        self._row = 0
        # int32 node ids while accumulating (m < 2^31 always here):
        # halves the resident edge arrays — at a dense-ish cutoff the
        # edge set, not the tiles, is the memory high-water mark
        self._cols = np.arange(self.m, dtype=np.int32)
        self.src, self.dst, self.w = [], [], []

    def append(self, tile):
        t = np.asarray(tile)
        rows = np.arange(self._row, self._row + t.shape[0], dtype=np.int32)
        mask = ((self._cols[None, :] > rows[:, None])
                & (t >= self.cutoff) & (t > 0))
        si, dj = np.nonzero(mask)
        self.src.append(rows[si])
        self.dst.append(dj.astype(np.int32))
        self.w.append(t[si, dj])
        self._row += t.shape[0]

    def result(self):
        assert self._row == self.m
        return (np.concatenate(self.src) if self.src else np.empty(0, np.int32),
                np.concatenate(self.dst) if self.dst else np.empty(0, np.int32),
                np.concatenate(self.w) if self.w else np.empty(0, np.float32))


def sparse_similarity_edges(counts, pearsoncutoff=0, mesh=None,
                            block_rows: int = 2048):
    """(src, dst, weights) of the thresholded self-similarity graph,
    extracted tile-by-tile (data-sharded over ``mesh`` when given) —
    the [m, m] matrix never exists on host."""
    m = int(np.shape(counts)[0])
    tiles = _EdgeTiles(m, pearsoncutoff)
    if mesh is not None:
        from seekr_tpu.parallel.dist import stream_pearson_sharded

        stream_pearson_sharded(mesh, counts, tiles, block_rows=block_rows)
    else:
        from seekr_tpu.io.stream import stream_pearson

        stream_pearson(counts, counts, tiles, block_rows=block_rows)
    return tiles.result()


def _edge_style(df, edgecolormethod, edgethreshold):
    """Edge colors/widths for the upper-triangle nonzero weights.

    'gradient': weights min-max mapped to [0.1, 1] grey scale + width 1..4;
    'threshold': black/4pt above threshold else grey/1pt
    (reference kmer_leiden.py:154-241).
    """
    row, col = np.triu_indices(df.shape[0], k=1)
    weights = df.values[row, col]
    keep = weights > 0
    weights = weights[keep]
    if edgecolormethod == "threshold":
        colors = ["black" if w > edgethreshold else "grey" for w in weights]
        widths = [4 if w > edgethreshold else 1 for w in weights]
        return colors, widths
    if edgecolormethod != "gradient":
        print("edgecolormethod must be either 'gradient' or 'threshold', "
              "use default 'gradient' now")
    if not len(weights):  # no pair cleared the cutoff: nothing to style
        return [], []
    span = weights.max() - weights.min()
    normalized = (weights - weights.min()) / (span if span > 0 else 1.0)
    mapped = 0.1 + 0.9 * normalized
    colors = [(1 - w, 1 - w, 1 - w) for w in mapped]
    widths = [1 + 3 * w for w in mapped]
    return colors, widths


def plot_network(df, membership, plotname, edgecolormethod="gradient",
                 edgethreshold=0.1, labelfontsize=12):
    """Spring-layout community plot saved as ``{plotname}.pdf``."""
    from seekr_tpu.viz.style import ensure_headless_backend
    ensure_headless_backend()
    import matplotlib.pyplot as plt
    import networkx as nx

    # positive weights only: community detection runs on the df>0 edge set
    # (reference builds igraph from df>0, kmer_leiden.py:106) but the
    # reference plots nx.from_pandas_adjacency(df) — ALL nonzero entries —
    # so with a negative pearsoncutoff the styling arrays desynchronize
    # from G.edges; plotting the same positive edge set is the intended
    # behavior (documented deviation)
    G = nx.from_pandas_adjacency(df.where(df > 0, 0.0))
    edge_colors, edge_widths = _edge_style(df, edgecolormethod, edgethreshold)
    community_colors = plt.cm.rainbow(np.linspace(0, 1, int(membership.max()) + 1))
    node_colors = [community_colors[c] for c in membership]
    pos = nx.spring_layout(G, weight="weight")
    plt.figure(figsize=(15, 15))
    plt.gca().axis("off")
    nx.draw_networkx_nodes(G, pos, node_color=node_colors, node_size=500)
    nx.draw_networkx_edges(G, pos, edge_color=edge_colors, width=edge_widths)
    nx.draw_networkx_labels(G, pos, font_size=labelfontsize,
                            font_family="sans-serif")
    plt.tight_layout()
    plt.savefig(f"{plotname}.pdf")
    plt.close()


def export_gephi_csv(df, membership, csvfile):
    """Write ``{csvfile}_nodes_leiden.csv`` / ``{csvfile}_edges_leiden.csv``.

    Same schema as reference kmer_leiden.py:319-346: nodes ordered by
    community (Id, Label, Color with 1-based community ids), edges = upper
    triangle melt (Source, Target, Weight).
    """
    _write_gephi_nodes(list(df.index), membership, csvfile)

    # bool from the start: float64 ones + triu copy would transiently
    # cost 16 bytes/cell (40 GB at the m=50k dense ceiling)
    mask = np.triu(np.ones(df.shape, dtype=bool), k=1)
    # explicit dropna: the reference relied on pandas<3 stack() dropping the
    # NaN-masked lower triangle (kmer_leiden.py:342)
    edges = df.where(mask).stack().dropna().reset_index()
    edges.columns = ["Source", "Target", "Weight"]
    edges.to_csv(f"{csvfile}_edges_leiden.csv", index=False)


def _write_gephi_nodes(names, membership, csvfile):
    """Nodes file shared by both Gephi exporters: rows ordered by
    community, 1-based community ids in Color."""
    import pandas as pd

    # rows ordered by community, ascending node index within each — a
    # stable argsort gives exactly that in O(m log m) (a scan per
    # community is O(C*m): minutes at streamed scale where a high
    # cutoff leaves most nodes as singleton communities)
    membership = np.asarray(membership)
    order = np.argsort(membership, kind="stable")
    labels = [names[i] for i in order]
    colors = [int(c) + 1 for c in membership[order]]
    nodes = pd.DataFrame({"Id": labels, "Label": labels, "Color": colors})
    nodes.to_csv(f"{csvfile}_nodes_leiden.csv", index=False)


def export_gephi_csv_edges(names, membership, src, dst, w, csvfile):
    """Streamed-mode Gephi export: same nodes file as export_gephi_csv;
    the edges file holds the DETECTED edge set (positive post-cutoff
    triu entries) instead of the reference's every-triu-cell melt —
    at streaming scale the full melt is the matrix itself (documented
    deviation; the detected set is what Gephi renders meaningfully)."""
    import pandas as pd

    _write_gephi_nodes(names, membership, csvfile)
    edges = pd.DataFrame({"Source": [names[i] for i in src],
                          "Target": [names[j] for j in dst],
                          "Weight": w})
    edges.to_csv(f"{csvfile}_edges_leiden.csv", index=False)


def kmer_leiden(inputfile, mean, std, k, algo="RBERVertexPartition", rs=1.0,
                pearsoncutoff=0, setseed=False, edgecolormethod="gradient",
                edgethreshold=0.1, labelfontsize=12, plotname=None,
                csvfile=None, stream=None, data_parallel=None):
    """Leiden community network for the sequences of ``inputfile``.

    Same signature and artifacts as reference kmer_leiden.py:66-69; returns
    the membership array (the reference returns None — returning the result
    is a strict superset of that contract).

    Extreme-scale extension: above ``LEIDEN_STREAM_CELL_THRESHOLD``
    similarity cells — m ~50k, far above the generic streaming cutover
    because streamed mode changes the artifacts (see below) — or with
    ``stream=True`` / ``data_parallel``, the
    thresholded edge set is extracted tile-by-tile from the device GEMM
    (``sparse_similarity_edges``, data-sharded with ``data_parallel``)
    and fed straight to the native Leiden engine — the [m, m] matrix
    never exists on host (the reference materializes it at
    kmer_leiden.py:91, ~130 GB float32 at the 180k GENCODE extreme).
    In streamed mode the spring-layout plot is skipped with a message
    (a 100k-node spring layout is not a meaningful artifact and needs
    the dense matrix) and the Gephi edges file holds the detected edge
    set (see export_gephi_csv_edges).  Edge weights may differ from the
    in-memory path at GEMM-retiling ulp, so a value within one ulp of
    the cutoff can flip in or out — same caveat as every blocked-GEMM
    consumer (membership at sane cutoffs is unaffected).
    """
    from seekr_tpu.viz.style import check_norm_compat

    # shared intended compatibility check (upstream kmer_leiden.py:75 has
    # the same operator-precedence bug as find_pval.py:76)
    if not check_norm_compat(mean, std, k,
                             "Leiden community is calculated or plotted"):
        return None

    from seekr_tpu.parallel.mesh import build_mesh_from_flags

    mesh = build_mesh_from_flags(data_parallel)
    counter = KmerCounter(inputfile, mean=mean, std=std, k=k, silent=True)
    m = len(counter.headers)
    do_stream = (stream if stream is not None
                 else (m * m > LEIDEN_STREAM_CELL_THRESHOLD
                       or mesh is not None))

    if do_stream:
        names = [h[1:] for h in counter.headers]
        src, dst, w = sparse_similarity_edges(
            counter.get_counts_device(), pearsoncutoff, mesh=mesh)
        membership = _run_leiden(src, dst, w, m, algo, rs, setseed)
        if plotname:
            print(f"kmer_leiden: streamed mode at m={m} skips the "
                  f"spring-layout plot ({plotname}.pdf not written) — "
                  "it needs the dense similarity matrix; use the Gephi "
                  "CSVs (csvfile=) for large-graph rendering.")
        if csvfile:
            export_gephi_csv_edges(names, membership, src, dst, w, csvfile)
        return membership

    df = similarity_graph(inputfile, mean, std, k, pearsoncutoff,
                          counter=counter, mesh=mesh)
    membership = leiden_membership(df, algo=algo, rs=rs, setseed=setseed)

    if plotname:
        plot_network(df, membership, plotname,
                     edgecolormethod=edgecolormethod,
                     edgethreshold=edgethreshold,
                     labelfontsize=labelfontsize)
    if csvfile:
        export_gephi_csv(df, membership, csvfile)
    return membership
