"""Mean +/- sd barplot of k-mer counts across sequences.

Behavioral parity with seekr/kmer_msd_barplot.py:59-171: per-k-mer mean/sd
across sequences, sorted by mean or sd, seaborn barplot with sd errorbars.
"""

from __future__ import annotations

from seekr_tpu.models.counter import KmerCounter
from seekr_tpu.viz.style import check_norm_compat, save_figure, setup_fonts


def kmer_msd_barplot(inputfile, mean, std, k, log2="Log2.post",
                     sortstat="mean", sortmethod="descending",
                     topkmernumber=10, xlabelsize=20, ylabelsize=20,
                     xticksize=20, yticksize=20,
                     outputname="test_kmer_msd_barplot", pformat="pdf",
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
    df = pd.DataFrame(counter.counts, index=headers, columns=counter.kmers)

    if sortstat not in ("mean", "sd"):
        print("Please choose a sorting stat: 'mean' or 'sd', use default "
              "'mean' and default sortmethod'descending' now")
        sortstat, sortmethod = "mean", "descending"
    if sortmethod not in ("ascending", "descending"):
        print("Please choose a sorting method: 'ascending' or 'descending', "
              "use default 'descending' now")
        sortmethod = "descending"
    stat = df.mean() if sortstat == "mean" else df.std()
    sorted_indices = stat.sort_values(
        ascending=(sortmethod == "ascending")).index
    df_reordered = df[sorted_indices]

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
    sns.barplot(x="Kword", y="Value", hue="Kword", data=df_plot,
                palette="tab10", errorbar="sd", capsize=0.2, legend=False)
    plt.xlabel("Kmer Words", fontsize=xlabelsize)
    plt.ylabel("z-score (transformed or raw)", fontsize=ylabelsize)
    plt.xticks(rotation=90, fontsize=xticksize)
    plt.yticks(fontsize=yticksize)
    save_figure(outputname, pformat, pdpi)
    plt.close("all")
