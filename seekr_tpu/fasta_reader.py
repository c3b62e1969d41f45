"""Reference-layout alias: `seekr.fasta_reader` -> seekr_tpu (see seekr/fasta_reader.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.io.fasta import Reader

__all__ = ['Reader']
