"""Worker process for the multi-process jax.distributed tests.

Launched by tests/test_distributed_multiprocess.py as
``python dist_worker.py <coordinator> <num_processes> <process_id>``.
Each worker owns 4 virtual CPU devices; the processes rendezvous via
jax.distributed.initialize (the NCCL/MPI-equivalent bootstrap the
reference lacks entirely), build one global mesh over all
4*num_processes devices, and run the sharded pipeline.  Every process
validates its addressable shards against the host oracle and prints
DIST_OK on success.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

# the axon sitecustomize pins jax_platforms at interpreter start; pin it back
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    from seekr_tpu.parallel.dist import distributed_pipeline, init_distributed
    from seekr_tpu.parallel.mesh import make_mesh
    from seekr_tpu.ops.count import count_kmers_host

    init_distributed(coordinator=coordinator, num_processes=num_processes,
                     process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.devices()) == 4 * num_processes, jax.devices()
    assert len(jax.local_devices()) == 4

    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(jax.devices())
    k, m, L = 3, 16, 128
    rng = np.random.default_rng(0)  # identical data in every process
    bases = rng.integers(0, 4, size=(m, L), dtype=np.int8)
    lengths = rng.integers(k + 1, L + 1, size=m).astype(np.int32)
    for r in range(m):
        bases[r, lengths[r]:] = 4

    data2 = NamedSharding(mesh, P("data", None))
    data1 = NamedSharding(mesh, P("data"))
    b = jax.make_array_from_callback((m, L), data2, lambda idx: bases[idx])
    n = jax.make_array_from_callback((m,), data1, lambda idx: lengths[idx])

    counts, mean, std, sim = distributed_pipeline(mesh, k=k)(b, n)

    # host oracle (Log2.post default epilogue, reference op order)
    letters = np.array(list("AGTC"))
    seqs = ["".join(letters[bases[r, :lengths[r]]]) for r in range(m)]
    raw = count_kmers_host(seqs, k)
    c = raw - raw.mean(axis=0)
    c /= c.std(axis=0)
    c += np.abs(c.min())
    c = np.log2(c + 1)
    cs = (c - c.mean(axis=1, keepdims=True)) / c.std(axis=1, keepdims=True)
    expected_sim = cs @ cs.T / c.shape[1]

    # every process checks the shards it can address
    n_checked = 0
    for s in counts.addressable_shards:
        assert np.allclose(np.asarray(s.data), c[s.index],
                           rtol=1e-4, atol=1e-4, equal_nan=True), "counts shard"
        n_checked += 1
    for s in sim.addressable_shards:
        assert np.allclose(np.asarray(s.data), expected_sim[s.index],
                           rtol=1e-3, atol=1e-4, equal_nan=True), "sim shard"
        n_checked += 1
    assert n_checked >= 8  # 4 local devices x 2 outputs

    # mean/std are replicated: the psum-merged global statistics
    local_mean = np.asarray(mean.addressable_shards[0].data)
    assert np.allclose(local_mean, raw.mean(axis=0), rtol=1e-5, atol=1e-4)

    # streamed Pearson is device-side throughout, so it must also work
    # multi-host, including row counts not divisible by the data axis
    from seekr_tpu.parallel.dist import stream_pearson_sharded

    class Collect:
        def __init__(self):
            self.blocks = []

        def append(self, blk):
            self.blocks.append(np.asarray(blk))

    rng2 = np.random.default_rng(1)
    s1 = rng2.normal(size=(13, 64)).astype(np.float32)
    s2 = rng2.normal(size=(11, 64)).astype(np.float32)
    w = Collect()
    stream_pearson_sharded(mesh, s1, w, block_rows=5, counts2=s2)
    got = np.vstack(w.blocks)
    z1 = (s1 - s1.mean(1, keepdims=True)) / s1.std(1, keepdims=True)
    z2 = (s2 - s2.mean(1, keepdims=True)) / s2.std(1, keepdims=True)
    want = z1 @ z2.T / s1.shape[1]
    assert got.shape == (13, 11)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-5), "streamed pearson"

    # norm stats: psum-merged column moments across process boundaries
    from seekr_tpu.parallel.dist import distributed_norm_stats

    nmean, nstd = distributed_norm_stats(mesh, k=k, log2="Log2.none")(b, n)
    assert np.allclose(np.asarray(nmean.addressable_shards[0].data),
                       raw.mean(axis=0), rtol=1e-5, atol=1e-4)
    assert np.allclose(np.asarray(nstd.addressable_shards[0].data),
                       raw.std(axis=0), rtol=1e-4, atol=1e-4)

    # sequence parallelism: one long transcript chunked across BOTH
    # processes' devices, partial histograms merged with a cross-host psum
    from seekr_tpu.io.encode import encode_seq
    from seekr_tpu.parallel.dist import (count_long_sequence,
                                         shard_long_sequence)
    from seekr_tpu.ops.count import count_kmers_host

    rng3 = np.random.default_rng(5)
    lseq = "".join(np.array(list("AGTC"))[rng3.integers(0, 4, 4096)])
    chunks, n_windows = shard_long_sequence(encode_seq(lseq), k,
                                            len(jax.devices()))
    row = count_long_sequence(mesh, k)(chunks, np.float32(n_windows))
    expected_row = count_kmers_host([lseq], k)[0]
    assert np.allclose(np.asarray(row.addressable_shards[0].data),
                       expected_row, rtol=1e-4, atol=1e-3), "seq-parallel"

    print(f"DIST_OK p{process_id}", flush=True)


if __name__ == "__main__":
    main()
