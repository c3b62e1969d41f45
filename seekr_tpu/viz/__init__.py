"""Visualization layer: heatmap, dendrogram, barplots, textplots.

Host-side matplotlib/seaborn tooling consuming TPU-computed matrices.
One public function per module, mirroring the reference CLI surface
(seekr/kmer_heatmap.py, kmer_dendrogram.py, kmer_count_barplot.py,
kmer_msd_barplot.py, kmer_comp_textplot.py, kmer_indi_textplot.py).
"""

from seekr_tpu.viz.kmer_heatmap import kmer_heatmap
from seekr_tpu.viz.kmer_dendrogram import kmer_dendrogram
from seekr_tpu.viz.kmer_count_barplot import kmer_count_barplot
from seekr_tpu.viz.kmer_msd_barplot import kmer_msd_barplot
from seekr_tpu.viz.textplot import kmer_comp_textplot, kmer_indi_textplot
from seekr_tpu.viz.visualize_distro import visualize_distro

__all__ = [
    "kmer_heatmap",
    "kmer_dendrogram",
    "kmer_count_barplot",
    "kmer_msd_barplot",
    "kmer_comp_textplot",
    "kmer_indi_textplot",
    "visualize_distro",
]
