"""Graph layer: community detection over TPU-computed Pearson matrices."""

from seekr_tpu.graph.kmer_leiden import kmer_leiden
from seekr_tpu.graph.maker import Maker

__all__ = ["kmer_leiden", "Maker"]
