"""Reference-layout alias: `seekr.kmer_counts` -> seekr_tpu (see seekr/kmer_counts.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.models.counter import BasicCounter, KmerCounter, Log2

__all__ = ['BasicCounter', 'KmerCounter', 'Log2']
