"""Reference-layout alias: `seekr.kmer_indi_textplot` -> seekr_tpu (see seekr/kmer_indi_textplot.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.viz.textplot import kmer_indi_textplot, find_word_coordinates, ass_color

__all__ = ['ass_color', 'find_word_coordinates', 'kmer_indi_textplot']


# The package root also exports `kmer_indi_textplot` as a FUNCTION (`from seekr_tpu
# import kmer_indi_textplot`); importing this module rebinds that attribute to the
# module object.  Making the module itself callable keeps BOTH idioms
# working in one process: `seekr_tpu.kmer_indi_textplot(...)` and
# `from seekr_tpu.kmer_indi_textplot import kmer_indi_textplot`.
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(kmer_indi_textplot)


_sys.modules[__name__].__class__ = _CallableModule
