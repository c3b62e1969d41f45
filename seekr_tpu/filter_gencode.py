"""Reference-layout alias: `seekr.filter_gencode` -> seekr_tpu (see seekr/filter_gencode.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.data.filter_gencode import filter_gencode, get_transcript_id_with_ensembl_canonical, get_transcript_id_with_isoform

__all__ = ['filter_gencode', 'get_transcript_id_with_ensembl_canonical', 'get_transcript_id_with_isoform']


# The package root also exports `filter_gencode` as a FUNCTION (`from seekr_tpu
# import filter_gencode`); importing this module rebinds that attribute to the
# module object.  Making the module itself callable keeps BOTH idioms
# working in one process: `seekr_tpu.filter_gencode(...)` and
# `from seekr_tpu.filter_gencode import filter_gencode`.
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(filter_gencode)


_sys.modules[__name__].__class__ = _CallableModule
