"""Device-accelerated pairwise-distance matrices for the clustering paths.

The reference clusters heatmaps/dendrograms with
``scipy.spatial.distance.pdist`` (seekr/kmer_heatmap.py:195,212,
kmer_dendrogram.py:100,119).  On the GENCODE-scale inputs this framework
targets, pdist is O(rows^2 * cols) on one CPU core — a 13k x 13k
similarity matrix takes HOURS, while the same arithmetic is a single
standardized GEMM on the MXU (<0.1 s).  The GEMM-able scipy metrics are
implemented here and the viz layer routes large inputs through them:

  * ``correlation``  1 - <x-x̄, y-ȳ> / (|x-x̄| |y-ȳ|)  (reference default)
  * ``cosine``       1 - <x, y> / (|x| |y|)
  * ``euclidean``    sqrt(|x|^2 + |y|^2 - 2<x,y>)
  * ``sqeuclidean``  |x|^2 + |y|^2 - 2<x,y>

Values match scipy within ~1e-5 (float32 device arithmetic at the
package Pearson precision vs scipy's float64); near-tie linkage merges
can therefore order differently — documented in PARITY.md.  The scipy
path stays the default below the size threshold and for every other
metric; ``SEEKR_TPU_PDIST={device,scipy}`` forces either side.
"""

from __future__ import annotations

import os

import numpy as np

#: metrics with a GEMM formulation (everything else always goes to scipy)
DEVICE_METRICS = ("correlation", "cosine", "euclidean", "sqeuclidean")

# device path by default only when the scipy cost rows^2*cols crosses
# ~10^10 flops (minutes on one core, trivial on the MXU)
_DEVICE_MIN_WORK = float(2 ** 33)


def use_device_pdist(rows: int, cols: int, metric: str) -> bool:
    """Routing decision for one pdist call (shape + metric + env)."""
    if str(metric) not in DEVICE_METRICS:
        return False
    forced = os.environ.get("SEEKR_TPU_PDIST", "").lower()
    if forced == "scipy":
        return False
    if forced == "device":
        return True
    return float(rows) * float(rows) * float(cols) >= _DEVICE_MIN_WORK


def _gram_graph(x, metric: str):
    """Traced [m, m] distance matrix for one of DEVICE_METRICS."""
    import jax.numpy as jnp
    from jax import lax

    from seekr_tpu.ops.precision import pearson_precision

    x = x.astype(jnp.float32)
    if metric == "correlation":
        x = x - jnp.mean(x, axis=1, keepdims=True)
    if metric in ("correlation", "cosine"):
        norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
        x = x / norm
        g = lax.dot_general(x, x, (((1,), (1,)), ((), ())),
                            precision=pearson_precision())
        return 1.0 - g
    g = lax.dot_general(x, x, (((1,), (1,)), ((), ())),
                        precision=pearson_precision())
    sq = jnp.diagonal(g)
    d2 = sq[:, None] + sq[None, :] - 2.0 * g
    d2 = jnp.maximum(d2, 0.0)  # clamp the GEMM's tiny negative residuals
    if metric == "sqeuclidean":
        return d2
    return jnp.sqrt(d2)


def pdist_device(data, metric: str = "correlation") -> np.ndarray:
    """scipy-compatible condensed distance vector, computed on device.

    Returns float64 [m*(m-1)/2] in scipy's row-major strict-upper-triangle
    order.  Raises ValueError for metrics outside DEVICE_METRICS.
    """
    import jax

    from seekr_tpu.utils.adj import triu_values

    metric = str(metric)
    if metric not in DEVICE_METRICS:
        raise ValueError(f"metric {metric!r} has no device formulation; "
                         f"supported: {DEVICE_METRICS}")
    arr = np.ascontiguousarray(data, dtype=np.float32)
    if arr.ndim != 2:
        raise ValueError("pdist_device needs a 2-D array")
    full = np.asarray(jax.jit(_gram_graph, static_argnames="metric")(
        arr, metric=metric))
    return triu_values(full.astype(np.float64))


def pdist_auto(data, metric: str = "correlation") -> np.ndarray:
    """pdist via the device GEMM when profitable, else scipy (exact)."""
    arr = np.asarray(data)
    if arr.ndim == 2 and use_device_pdist(arr.shape[0], arr.shape[1],
                                          metric):
        try:
            return pdist_device(arr, metric=metric)
        except Exception as e:  # no device / compile failure
            # scipy still works, but at this size it is O(rows^2 cols)
            # on one core — hours, not seconds.  Never downgrade silently.
            import sys as _sys

            print(f"seekr_tpu: device pdist unavailable "
                  f"({type(e).__name__}: {str(e)[:120]}); falling back to "
                  f"single-core scipy pdist — this may take a long time "
                  f"at {arr.shape[0]} x {arr.shape[1]}.",
                  file=_sys.stderr, flush=True)
    from scipy.spatial.distance import pdist
    return pdist(arr, metric=metric)
