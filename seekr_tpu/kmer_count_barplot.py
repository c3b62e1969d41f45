"""Reference-layout alias: `seekr.kmer_count_barplot` -> seekr_tpu (see seekr/kmer_count_barplot.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.viz.kmer_count_barplot import kmer_count_barplot

__all__ = ['kmer_count_barplot']


# The package root also exports `kmer_count_barplot` as a FUNCTION (`from seekr_tpu
# import kmer_count_barplot`); importing this module rebinds that attribute to the
# module object.  Making the module itself callable keeps BOTH idioms
# working in one process: `seekr_tpu.kmer_count_barplot(...)` and
# `from seekr_tpu.kmer_count_barplot import kmer_count_barplot`.
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(kmer_count_barplot)


_sys.modules[__name__].__class__ = _CallableModule
