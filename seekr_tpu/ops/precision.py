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


def pearson_precision():
    import jax

    name = os.environ.get("SEEKR_TPU_MATMUL_PRECISION", "high").upper()
    return getattr(jax.lax.Precision, name, jax.lax.Precision.HIGH)
