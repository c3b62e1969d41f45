"""Data acquisition: GENCODE download + fasta filtering (host-side, L0)."""

from seekr_tpu.data.canonical import canonical_gencode
from seekr_tpu.data.gencode import Downloader
from seekr_tpu.data.filter_gencode import filter_gencode
from seekr_tpu.data.rand_rnas import RandomMaker, gen_rand_rnas

__all__ = ["Downloader", "filter_gencode", "RandomMaker", "gen_rand_rnas",
           "canonical_gencode"]
