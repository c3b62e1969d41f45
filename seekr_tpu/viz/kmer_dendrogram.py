"""Row/column hierarchical-clustering dendrogram.

Behavioral parity with seekr/kmer_dendrogram.py:49-139 (pdist -> linkage ->
scipy dendrogram with labels, distance_sort, 90-degree leaf rotation).
"""

from __future__ import annotations

from seekr_tpu.viz.style import save_figure, setup_fonts


def kmer_dendrogram(df, dendro_direct="row", distmetric="correlation",
                    linkmethod="complete", plot_ht=8, wd_ratio=0.5,
                    leaf_font_size=16, outputname="test_kmer_dendrogram",
                    pformat="pdf", pdpi=300):
    from seekr_tpu.viz.style import ensure_headless_backend
    ensure_headless_backend()
    import matplotlib.pyplot as plt
    from scipy.cluster.hierarchy import dendrogram, linkage

    from seekr_tpu.ops.dist import pdist_auto

    if dendro_direct == "row":
        link = linkage(pdist_auto(df, metric=distmetric), linkmethod)
        labels = df.index
        n_leaves = df.shape[0]
    elif dendro_direct == "column":
        link = linkage(pdist_auto(df.T.values, metric=distmetric),
                       linkmethod)
        labels = df.columns
        n_leaves = df.shape[1]
    else:
        print("dendro_direct must be either 'row' or 'column'. "
              "Please check and rerun.")
        return

    if wd_ratio <= 0:
        print("wd_ratio must be a positive number (>0). "
              "Use default wd_ratio instead: 0.5")
        wd_ratio = 0.5
    if plot_ht <= 0:
        print("plot_ht must be a positive number (>0). "
              "Use default plot_ht instead: 8")
        plot_ht = 8

    fx = round(n_leaves * wd_ratio)
    plt.figure(figsize=(fx, plot_ht))
    setup_fonts()
    dendrogram(link, labels=labels, distance_sort=True, leaf_rotation=90,
               leaf_font_size=leaf_font_size)
    save_figure(outputname, pformat, pdpi)
    plt.close("all")
