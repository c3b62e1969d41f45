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

from seekr_tpu.models.counter import KmerCounter, BasicCounter
from seekr_tpu.models.pearson import pearson
from seekr_tpu.stats import adj_pval, find_dist, find_pval
from seekr_tpu.data import Downloader, filter_gencode

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
