"""Model-level APIs (lazy exports — see the package-root rationale)."""

_LAZY_EXPORTS = {
    "KmerCounter": ("seekr_tpu.models.counter", "KmerCounter"),
    "BasicCounter": ("seekr_tpu.models.counter", "BasicCounter"),
    "Log2": ("seekr_tpu.models.counter", "Log2"),
    "make_count_file": ("seekr_tpu.models.counter", "make_count_file"),
    "DomainPearson": ("seekr_tpu.models.domain", "DomainPearson"),
    "pearson": ("seekr_tpu.models.pearson", "pearson"),
    "SeekrPipeline": ("seekr_tpu.models.pipeline", "SeekrPipeline"),
}

__all__ = ["KmerCounter", "BasicCounter", "Log2", "make_count_file",
           "pearson", "SeekrPipeline", "DomainPearson"]


def __getattr__(name):
    if name in _LAZY_EXPORTS:
        import importlib

        mod, attr = _LAZY_EXPORTS[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'seekr_tpu.models' has no attribute {name!r}")
