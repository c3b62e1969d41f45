"""Reference-layout alias: `seekr.find_pval` -> seekr_tpu (see seekr/find_pval.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.stats.find_pval import find_pval, is_float_type, check_tuple_format, check_main_list

__all__ = ['check_main_list', 'check_tuple_format', 'find_pval', 'is_float_type']


# The package root also exports `find_pval` as a FUNCTION (`from seekr_tpu
# import find_pval`); importing this module rebinds that attribute to the
# module object.  Making the module itself callable keeps BOTH idioms
# working in one process: `seekr_tpu.find_pval(...)` and
# `from seekr_tpu.find_pval import find_pval`.
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(find_pval)


_sys.modules[__name__].__class__ = _CallableModule
