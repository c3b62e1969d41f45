"""Reference-layout alias: `seekr.adj_pval` -> seekr_tpu (see seekr/adj_pval.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.stats.adj_pval import adj_pval, is_symmetric

__all__ = ['adj_pval', 'is_symmetric']


# The package root also exports `adj_pval` as a FUNCTION (`from seekr_tpu
# import adj_pval`); importing this module rebinds that attribute to the
# module object.  Making the module itself callable keeps BOTH idioms
# working in one process: `seekr_tpu.adj_pval(...)` and
# `from seekr_tpu.adj_pval import adj_pval`.
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(adj_pval)


_sys.modules[__name__].__class__ = _CallableModule
