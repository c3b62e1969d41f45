"""Reference-layout alias: `seekr.kmer_dendrogram` -> seekr_tpu (see seekr/kmer_dendrogram.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.viz.kmer_dendrogram import kmer_dendrogram

__all__ = ['kmer_dendrogram']


# The package root also exports `kmer_dendrogram` as a FUNCTION (`from seekr_tpu
# import kmer_dendrogram`); importing this module rebinds that attribute to the
# module object.  Making the module itself callable keeps BOTH idioms
# working in one process: `seekr_tpu.kmer_dendrogram(...)` and
# `from seekr_tpu.kmer_dendrogram import kmer_dendrogram`.
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(kmer_dendrogram)


_sys.modules[__name__].__class__ = _CallableModule
