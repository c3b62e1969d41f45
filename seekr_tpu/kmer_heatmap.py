"""Reference-layout alias: `seekr.kmer_heatmap` -> seekr_tpu (see seekr/kmer_heatmap.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.viz.kmer_heatmap import kmer_heatmap
from seekr_tpu.viz.style import is_hex_color, check_hex_colors

__all__ = ['check_hex_colors', 'is_hex_color', 'kmer_heatmap']


# The package root also exports `kmer_heatmap` as a FUNCTION (`from seekr_tpu
# import kmer_heatmap`); importing this module rebinds that attribute to the
# module object.  Making the module itself callable keeps BOTH idioms
# working in one process: `seekr_tpu.kmer_heatmap(...)` and
# `from seekr_tpu.kmer_heatmap import kmer_heatmap`.
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(kmer_heatmap)


_sys.modules[__name__].__class__ = _CallableModule
