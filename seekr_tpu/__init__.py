"""seekr_tpu — a TPU-native k-mer sequence-analysis framework.

Capabilities mirror CalabreseLab/seekr v2.0.2 (FASTA -> k-mer count matrix ->
Pearson all-pairs correlation -> background-distribution p-values -> multiple
test correction -> clustering/visualization) but the architecture is built
for TPUs from scratch:

  * 2-bit nucleotide tokenization with length bucketing (``seekr_tpu.io``)
  * MXU-friendly outer-product histogram k-mer counting and a fused
    normalization epilogue under ``jit`` (``seekr_tpu.ops``)
  * tiled all-pairs Pearson as an XLA GEMM (``seekr_tpu.ops.pearson``)
  * SPMD data parallelism over a ``jax.sharding.Mesh`` with XLA collectives
    (``seekr_tpu.parallel``)
  * host-side statistics, graph clustering (native C++ Leiden) and plotting
    consuming TPU-computed matrices (``seekr_tpu.stats``, ``.graph``, ``.viz``)

File artifacts (counts CSV/npy, mean/std npy, pearson npy/csv, p-value CSV)
are byte-compatible with the reference tool so shell pipelines carry over.
"""

from seekr_tpu.__version__ import __version__, __title__, __description__, __url__, __license__

# Exports resolve lazily (PEP 562): the package root must stay jax-free —
# every console entry point imports it, and the pure host commands
# (heatmap, dendrogram, adj_pval, textplots) must not pay the multi-second
# jax/device import for work that never touches an accelerator.
_LAZY_EXPORTS = {
    "KmerCounter": ("seekr_tpu.models.counter", "KmerCounter"),
    "BasicCounter": ("seekr_tpu.models.counter", "BasicCounter"),
    "pearson": ("seekr_tpu.models.pearson", "pearson"),
    "find_dist": ("seekr_tpu.stats", "find_dist"),
    "find_pval": ("seekr_tpu.stats", "find_pval"),
    "adj_pval": ("seekr_tpu.stats", "adj_pval"),
    "Downloader": ("seekr_tpu.data", "Downloader"),
    "filter_gencode": ("seekr_tpu.data", "filter_gencode"),
}

__all__ = [
    "KmerCounter",
    "BasicCounter",
    "pearson",
    "find_dist",
    "find_pval",
    "adj_pval",
    "Downloader",
    "filter_gencode",
    "__version__",
]


def __getattr__(name):
    # graph/viz pull in matplotlib/networkx; SeekrPipeline pulls in jax
    # device init — import lazily
    if name in _LAZY_EXPORTS:
        import importlib

        mod, attr = _LAZY_EXPORTS[name]
        return getattr(importlib.import_module(mod), attr)
    if name == "SeekrPipeline":
        from seekr_tpu.models.pipeline import SeekrPipeline
        return SeekrPipeline
    if name == "kmer_leiden":
        from seekr_tpu.graph import kmer_leiden
        return kmer_leiden
    if name in ("kmer_heatmap", "kmer_dendrogram", "kmer_count_barplot",
                "kmer_msd_barplot", "kmer_comp_textplot",
                "kmer_indi_textplot"):
        import seekr_tpu.viz as viz
        return getattr(viz, name)
    raise AttributeError(f"module 'seekr_tpu' has no attribute {name!r}")
