"""Sharded checkpoint save/restore on the virtual CPU mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from seekr_tpu.io.checkpoint import (load_sharded, save_pipeline_state,
                                     save_sharded)
from seekr_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_roundtrip_same_sharding(tmp_path):
    mesh = make_mesh(jax.devices()[:8])
    sharding = NamedSharding(mesh, P("data", None))
    x = np.arange(16 * 32, dtype=np.float32).reshape(16, 32)
    xs = jax.device_put(x, sharding)
    path = str(tmp_path / "ckpt")
    save_sharded(path, xs)
    restored = load_sharded(path, sharding=sharding, shape=x.shape,
                            dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(restored), x)
    assert restored.sharding == sharding


def test_sharded_save_restore_resharded(tmp_path):
    mesh = make_mesh(jax.devices()[:8], kmer_parallel=2)
    row_shard = NamedSharding(mesh, P("data", None))
    grid_shard = NamedSharding(mesh, P("data", "kmer"))
    x = np.random.default_rng(0).normal(size=(8, 64)).astype(np.float32)
    save_sharded(str(tmp_path / "c"), jax.device_put(x, row_shard))
    restored = load_sharded(str(tmp_path / "c"), sharding=grid_shard,
                            shape=x.shape, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(restored), x)
    assert restored.sharding == grid_shard


def test_save_pipeline_state_artifacts(tmp_path):
    mesh = make_mesh(jax.devices()[:8])
    sharding = NamedSharding(mesh, P("data", None))
    counts = jax.device_put(np.ones((8, 16), np.float32), sharding)
    mean = np.zeros(16, np.float32)
    std = np.ones(16, np.float32)
    d = str(tmp_path / "state")
    save_pipeline_state(d, counts=counts, mean=mean, std=std)
    # mean/std are reference-compatible plain .npy artifacts
    np.testing.assert_array_equal(np.load(f"{d}/mean.npy"), mean)
    np.testing.assert_array_equal(np.load(f"{d}/std.npy"), std)
    restored = load_sharded(f"{d}/counts")
    np.testing.assert_array_equal(np.asarray(restored), np.ones((8, 16)))


def test_relative_path_roundtrip(tmp_path, monkeypatch):
    # orbax requires absolute paths; save/load absolutize relative ones
    monkeypatch.chdir(tmp_path)
    x = np.arange(32, dtype=np.float32).reshape(4, 8)
    save_sharded("rel_ckpt", jax.device_put(x))
    restored = load_sharded("rel_ckpt")
    np.testing.assert_array_equal(np.asarray(restored), x)


def test_save_overwrites_existing_checkpoint(tmp_path):
    """A rerun must overwrite its own checkpoint (review finding: orbax
    refuses by default, so the restart died with 'Destination already
    exists' at exactly the save it was restarted to redo)."""
    import numpy as np

    from seekr_tpu.io.checkpoint import load_sharded, save_sharded

    path = tmp_path / "ck"
    save_sharded(str(path), np.arange(6.0))
    save_sharded(str(path), np.arange(6.0) * 2)  # rerun: must not raise
    np.testing.assert_array_equal(np.asarray(load_sharded(str(path))),
                                  np.arange(6.0) * 2)
