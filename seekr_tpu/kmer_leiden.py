"""Reference-layout alias: `seekr.kmer_leiden` -> seekr_tpu (see seekr/kmer_leiden.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.graph.kmer_leiden import kmer_leiden

__all__ = ['kmer_leiden']


# The package root also exports `kmer_leiden` as a FUNCTION (`from seekr_tpu
# import kmer_leiden`); importing this module rebinds that attribute to the
# module object.  Making the module itself callable keeps BOTH idioms
# working in one process: `seekr_tpu.kmer_leiden(...)` and
# `from seekr_tpu.kmer_leiden import kmer_leiden`.
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(kmer_leiden)


_sys.modules[__name__].__class__ = _CallableModule
