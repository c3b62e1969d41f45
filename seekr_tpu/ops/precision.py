"""Matmul precision policy for the Pearson GEMMs.

Measured on v5e (2048x4096 Gram matrix, vs float64):

  DEFAULT (bf16)        1.07 ms   max err 3.6e-4   — outside parity budget
  HIGH    (bf16x3)      1.43 ms   max err 1.3e-5   — default: 1.4x faster
  HIGHEST (bf16x6)      2.02 ms   max err 7.8e-7     than HIGHEST, ~8x
                                                     inside the reference's
                                                     1e-4 tolerance

Override with SEEKR_TPU_MATMUL_PRECISION=default|high|highest.
"""

from __future__ import annotations

import os


_warned_invalid = False


def pearson_precision():
    import jax

    name = os.environ.get("SEEKR_TPU_MATMUL_PRECISION", "high").upper()
    if name not in ("DEFAULT", "HIGH", "HIGHEST"):
        # a typo'd override silently running at HIGH would make the knob
        # appear dead while the user debugs parity — say so, once
        global _warned_invalid
        if not _warned_invalid:
            _warned_invalid = True
            import warnings

            warnings.warn(
                f"SEEKR_TPU_MATMUL_PRECISION={name!r} is not one of "
                f"default|high|highest; using 'high'")
        name = "HIGH"
    return getattr(jax.lax.Precision, name)
