"""Grouped barplot of normalized k-mer counts for up to 10 sequences.

Behavioral parity with seekr/kmer_count_barplot.py:57-160: counts via the
TPU engine, k-mer columns ordered by summed |difference from column mean|,
melt to long format, seaborn grouped barplot of the first ``topkmernumber``
words per sequence.
"""

from __future__ import annotations

import numpy as np

from seekr_tpu.models.counter import KmerCounter
from seekr_tpu.viz.style import check_norm_compat, save_figure, setup_fonts


def kmer_count_barplot(inputfile, mean, std, k, log2="Log2.post",
                       sortmethod="ascending", topkmernumber=10,
                       xlabelsize=20, ylabelsize=20, xticksize=20,
                       yticksize=20, legendsize=12,
                       outputname="test_kmer_count_barplot", pformat="pdf",
                       pdpi=300):
    from seekr_tpu.viz.style import ensure_headless_backend
    ensure_headless_backend()
    import matplotlib.pyplot as plt
    import pandas as pd
    import seaborn as sns

    if not check_norm_compat(mean, std, k, "barplot is plotted"):
        return None

    counter = KmerCounter(inputfile, mean=mean, std=std, log2=log2, k=k,
                          silent=True)
    counter.make_count_file()
    headers = [h[1:] for h in counter.headers]  # counter already parsed
    counts = counter.counts

    if len(headers) > 10:
        print("There are more than 10 input sequences, "
              "only plot the first 10 sequences")
        headers = headers[:10]
        counts = counts[:10]

    df = pd.DataFrame(counts, index=headers, columns=counter.kmers)
    column_means = df.mean()
    if sortmethod not in ("ascending", "descending"):
        print("Please choose a sorting method: 'ascending' or 'descending', "
              "use default 'ascending' now")
        sortmethod = "ascending"
    order = ((df - column_means).abs().sum()
             .sort_values(ascending=(sortmethod == "ascending")).index)
    df_reordered = df[order]

    df_melted = df_reordered.reset_index().melt(
        id_vars="index", value_vars=list(df_reordered.columns))
    df_melted.columns = ["Sample", "Kword", "Value"]

    ttlnum = topkmernumber * len(headers)
    if ttlnum > len(df_melted):
        print(f"Only {int(len(df_melted) / len(headers))} kmer words, less "
              f"than {topkmernumber} words you want to plot, plot all words")
        df_plot = df_melted
    else:
        df_plot = df_melted[:ttlnum]

    plt.figure(figsize=(topkmernumber * 2, 8))
    setup_fonts()
    sns.barplot(x="Kword", y="Value", hue="Sample", data=df_plot,
                palette="tab10")
    plt.xlabel("Kmer Words", fontsize=xlabelsize)
    plt.ylabel("z-score (transformed or raw)", fontsize=ylabelsize)
    plt.xticks(rotation=90, fontsize=xticksize)
    plt.yticks(fontsize=yticksize)
    plt.legend(loc="center left", bbox_to_anchor=(1, 0.5), fontsize=legendsize)
    save_figure(outputname, pformat, pdpi)
    plt.close("all")
