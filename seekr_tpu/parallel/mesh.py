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


def build_mesh_from_flags(data_parallel, kmer_parallel=1, coordinator=None,
                          num_processes=None, process_id=None):
    """CLI-flag mesh construction shared by the -dp/-kp extension flags.

    Returns None when no parallelism was requested (single-device path).
    Bootstraps multi-host first when num_processes > 1; multi-host meshes
    must use every device (a subset could exclude entire processes).
    """
    from seekr_tpu.parallel.dist import init_distributed

    if num_processes and num_processes > 1:
        init_distributed(coordinator=coordinator, num_processes=num_processes,
                         process_id=process_id)
    if not data_parallel and kmer_parallel > 1:
        data_parallel = 1  # -kp without -dp still builds a mesh
    if not data_parallel or data_parallel * max(kmer_parallel, 1) <= 1:
        return None

    need = data_parallel * max(kmer_parallel, 1)
    devices = jax.devices()
    if need > len(devices):
        raise ValueError(f"requested {need} devices "
                         f"(data_parallel={data_parallel} x "
                         f"kmer_parallel={kmer_parallel}), "
                         f"have {len(devices)}")
    if jax.process_count() > 1 and need != len(devices):
        raise ValueError(
            f"multi-host runs must use all {len(devices)} devices: set "
            f"data_parallel x kmer_parallel == {len(devices)}")
    return make_mesh(devices[:need], kmer_parallel=max(kmer_parallel, 1))
