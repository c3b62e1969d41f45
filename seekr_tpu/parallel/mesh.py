"""Device mesh construction and sharding helpers.

The reference is a single Python process with no parallelism of any kind
(SURVEY section 2); the TPU framework's first-class replacement is a
``jax.sharding.Mesh`` with two logical axes:

  * ``data`` — transcripts (rows of the count matrix).  The workload is
    embarrassingly parallel over transcripts; this is the main scaling axis
    and maps across hosts/chips (ICI within a slice, DCN across slices).
  * ``kmer`` — the 4^k histogram columns.  Sharded only when 4^k is large
    enough that a full count matrix strains per-chip HBM (k >= 8), the
    tensor-parallel analog.

XLA's GSPMD partitioner inserts the collectives (psum for column moments,
all-gather for the Pearson right operand) from sharding annotations alone.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
KMER_AXIS = "kmer"


def make_mesh(devices: Optional[Sequence] = None, kmer_parallel: int = 1) -> Mesh:
    """Build a (data, kmer) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % kmer_parallel == 0, "device count must be divisible by kmer_parallel"
    grid = np.asarray(devices).reshape(n // kmer_parallel, kmer_parallel)
    return Mesh(grid, (DATA_AXIS, KMER_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Rows sharded over 'data', remaining axes replicated."""
    spec = [DATA_AXIS] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def row_col_sharding(mesh: Mesh) -> NamedSharding:
    """[rows, cols] sharded over ('data', 'kmer')."""
    return NamedSharding(mesh, P(DATA_AXIS, KMER_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_shards(n: int, n_shards: int) -> int:
    """Round row count up so it divides evenly across data shards."""
    return -(-n // n_shards) * n_shards
