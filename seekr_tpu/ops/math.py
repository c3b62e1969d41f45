"""Accurate float32 transcendentals built from exact VPU ops.

XLA lowers ``log``/``log2`` to fast polynomial approximations whose float32
error (~1.5e-4 absolute) exceeds the reference parity budget
(np.allclose rtol=1e-4, atol=1e-5 — reference tests/test_kmer_counts.py:106).
``accurate_log2`` reaches ~2-3 ulp using only bitcasts, compares, mul/add and
one divide — all exactly-rounded on both TPU and CPU backends, so results are
backend-independent.

Method (standard libm construction):
    x = m * 2^e, m in [1, 2)            (bitcast exponent/mantissa split)
    fold m > sqrt(2) down one octave so m in [sqrt(2)/2, sqrt(2)]
    s = (m - 1) / (m + 1), |s| <= 0.1716
    log(m) = 2 * atanh(s) = 2s * (1 + s^2/3 + s^4/5 + s^6/7 + s^8/9)
    log2(x) = e + log(m) / ln(2)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INV_LN2 = 1.4426950408889634  # 1/ln(2)
_SQRT2 = 1.4142135623730951


def accurate_log2(x: jax.Array) -> jax.Array:
    """float32 log2 with ~2-3 ulp error; NaN/inf/non-positive delegate to XLA."""
    x = x.astype(jnp.float32)
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = ((xi >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (xi & 0x007FFFFF) | (127 << 23), jnp.float32
    )
    big = m > _SQRT2
    m = jnp.where(big, m * 0.5, m)
    e = jnp.where(big, e + 1, e).astype(jnp.float32)

    s = (m - 1.0) / (m + 1.0)
    s2 = s * s
    # atanh series, Horner; |s| <= 0.1716 so the s^10 tail is < 6e-9 relative
    p = 1.0 / 9.0
    p = p * s2 + 1.0 / 7.0
    p = p * s2 + 1.0 / 5.0
    p = p * s2 + 1.0 / 3.0
    p = p * s2 + 1.0
    log_m = 2.0 * s * p
    out = e + log_m * jnp.float32(_INV_LN2)

    # special values (x <= 0, inf, nan, denormal): XLA's own log2 is exact there
    normal = (x >= jnp.float32(1.17549435e-38)) & jnp.isfinite(x)
    return jnp.where(normal, out, jnp.log2(x))


def log2_1p(x: jax.Array) -> jax.Array:
    """log2(x + 1) — the reference's log2_norm transform (kmer_counts.py:189-192)."""
    return accurate_log2(x + 1.0)
