"""Reference-layout alias: `seekr.fasta` -> seekr_tpu (see seekr/fasta.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.data.gencode import Downloader

__all__ = ['Downloader']
