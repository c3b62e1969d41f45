"""Checkpoint / resume for device (possibly sharded) arrays.

The reference's checkpoints ARE its file artifacts (counts csv/npy, mean/std
npy — SURVEY.md section 5 "file artifacts are the checkpoints") and those
formats are kept byte-compatible by the engine.  This module adds what the
reference cannot do: persisting a *sharded* intermediate (e.g. a count
matrix distributed over a pod mesh) without gathering it to one host, and
restoring it with the same or a different sharding.

Backend: orbax — an optional dependency (``pip install seekr-tpu[checkpoint]``).
Arrays are saved per-shard by the hosts that own them; restore takes a
NamedSharding so each host reads only its shards.
"""

from __future__ import annotations

import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp
    except ImportError as e:  # pragma: no cover - exercised without the extra
        raise ImportError(
            "seekr_tpu.io.checkpoint requires orbax-checkpoint; install the "
            "extra with: pip install seekr-tpu[checkpoint]") from e
    return ocp


def save_sharded(path: str, array) -> None:
    """Save a (device, possibly sharded) array as an orbax checkpoint."""
    import os

    import jax

    ocp = _orbax()
    path = os.path.abspath(path)  # orbax rejects relative checkpoint paths

    ckptr = ocp.StandardCheckpointer()
    # StandardCheckpointer takes pytrees, not bare arrays.  force=True:
    # checkpoints exist to be overwritten on a rerun — without it a
    # crashed job's restart dies with 'Destination ... already exists'
    # at exactly the save it was restarted to redo
    ckptr.save(path, {"array": jax.numpy.asarray(array)}, force=True)
    ckptr.wait_until_finished()


def load_sharded(path: str, sharding=None, shape=None, dtype=None):
    """Restore an orbax checkpoint, optionally onto a target sharding.

    With ``sharding`` (a jax.sharding.NamedSharding) + ``shape``/``dtype``,
    each process restores only the shards it owns; without it the array is
    restored with the layout recorded at save time.
    """
    import os

    import jax

    ocp = _orbax()
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if sharding is None:
        return ckptr.restore(path)["array"]
    abstract = jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)
    return ckptr.restore(path, {"array": abstract})["array"]


def save_pipeline_state(directory: str, *, counts=None, mean=None, std=None,
                        sim=None) -> None:
    """Persist any subset of pipeline intermediates under ``directory``.

    Sharded arrays go through orbax; plain numpy vectors as .npy files with
    the reference's artifact semantics (mean/std loadable by BasicCounter's
    mean=/std= path, kmer_counts.py:110-114).
    """
    import os

    os.makedirs(directory, exist_ok=True)
    if counts is not None:
        save_sharded(os.path.join(directory, "counts"), counts)
    if sim is not None:
        save_sharded(os.path.join(directory, "pearson"), sim)
    if mean is not None:
        np.save(os.path.join(directory, "mean.npy"), np.asarray(mean))
    if std is not None:
        np.save(os.path.join(directory, "std.npy"), np.asarray(std))
