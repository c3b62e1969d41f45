"""Reference-layout alias: `seekr.pearson` -> seekr_tpu (see seekr/pearson.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.models.pearson import pearson

__all__ = ['pearson']


# The package root also exports `pearson` as a FUNCTION (`from seekr_tpu
# import pearson`); importing this module rebinds that attribute to the
# module object.  Making the module itself callable keeps BOTH idioms
# working in one process: `seekr_tpu.pearson(...)` and
# `from seekr_tpu.pearson import pearson`.
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(pearson)


_sys.modules[__name__].__class__ = _CallableModule
