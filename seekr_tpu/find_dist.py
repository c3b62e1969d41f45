"""Reference-layout alias: `seekr.find_dist` -> seekr_tpu (see seekr/find_dist.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.stats.find_dist import find_dist

__all__ = ['find_dist']


# The package root also exports `find_dist` as a FUNCTION (`from seekr_tpu
# import find_dist`); importing this module rebinds that attribute to the
# module object.  Making the module itself callable keeps BOTH idioms
# working in one process: `seekr_tpu.find_dist(...)` and
# `from seekr_tpu.find_dist import find_dist`.
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(find_dist)


_sys.modules[__name__].__class__ = _CallableModule
