"""Reference-layout alias: `seekr.my_tqdm` -> seekr_tpu (see seekr/my_tqdm.py).

Migration aid so a reference user's imports keep working after
`s/seekr/seekr_tpu/` — the real implementation lives at the canonical
path below; nothing is defined here.
"""

from seekr_tpu.utils.progress import my_tqdm, my_trange, _is_kernel

__all__ = ['my_tqdm', 'my_trange']


# The package root also exports `my_tqdm` as a FUNCTION (`from seekr_tpu
# import my_tqdm`); importing this module rebinds that attribute to the
# module object.  Making the module itself callable keeps BOTH idioms
# working in one process: `seekr_tpu.my_tqdm(...)` and
# `from seekr_tpu.my_tqdm import my_tqdm`.
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(my_tqdm)


_sys.modules[__name__].__class__ = _CallableModule
