"""Worker process for the multi-host pod-serving test.

Launched by tests/test_distributed_multiprocess.py as
``python pod_worker.py <coordinator> <num_processes> <process_id>``.
Every process builds the SAME SeekrService over one global mesh
(4 virtual CPU devices per process); process 0 acts as the serving
leader (queries + live corpus growth, answers checked against a purely
LOCAL single-device oracle service), the others mirror its device calls
through ``SeekrService.follow()`` until the leader's stop releases
them.  This exercises the real PodScorer broadcast protocol
(parallel/dist.py) — the thing a single-process accept loop cannot do
over a multi-host mesh.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 4


def _seqs(rng, n, lo=120, hi=240):
    letters = np.array(list("AGTC"))
    return ["".join(letters[rng.integers(0, 4, rng.integers(lo, hi))])
            for _ in range(n)]


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    from seekr_tpu.parallel.dist import init_distributed
    from seekr_tpu.parallel.mesh import make_mesh

    init_distributed(coordinator=coordinator, num_processes=num_processes,
                     process_id=process_id)
    assert jax.process_count() == num_processes

    from seekr_tpu.serve import SeekrService

    # identical data in every process (the protocol broadcasts queries,
    # but the corpus construction itself is replicated-by-construction)
    rng = np.random.default_rng(7)
    targets = _seqs(rng, 13)            # non-divisible over 8/16 devices
    queries = _seqs(rng, 3)
    extra = _seqs(rng, 4)
    mean = rng.normal(1.0, 0.1, 4 ** K).astype(np.float32)
    std = rng.normal(1.0, 0.05, 4 ** K).astype(np.float32)

    mesh = make_mesh(jax.devices())
    svc = SeekrService(mean, std, k=K, targets=targets, mesh=mesh)
    from seekr_tpu.parallel.dist import PodScorer

    assert isinstance(svc._scorer, PodScorer), type(svc._scorer)

    if process_id != 0:
        svc.follow()                    # mirrors until the leader stops
        print(f"DIST_OK p{process_id}", flush=True)
        return

    # leader: answers must match a purely local single-device service
    oracle = SeekrService(mean, std, k=K, targets=targets)
    got = svc.query(queries, want=("sim", "topk"), topk=5)
    want = oracle.query(queries, want=("sim", "topk"), topk=5)
    assert np.allclose(got["sim"], want["sim"], rtol=1e-4, atol=1e-5)
    assert np.array_equal(got["topk_idx"], want["topk_idx"])
    assert np.allclose(got["topk_sim"], want["topk_sim"],
                       rtol=1e-4, atol=1e-5)

    # live corpus growth rides a GROW broadcast: every process re-shards
    assert svc.add_targets(extra) == (17, 4)
    oracle.add_targets(extra)
    got2 = svc.query(queries, want=("sim", "topk"), topk=17)
    want2 = oracle.query(queries, want=("sim", "topk"), topk=17)
    assert np.asarray(got2["sim"]).shape == (3, 17)
    assert np.allclose(got2["sim"], want2["sim"], rtol=1e-4, atol=1e-5)
    assert np.array_equal(got2["topk_idx"], want2["topk_idx"])

    # topk-only path (no gathered sim executable involved)
    got3 = svc.query(queries, want=("topk",), topk=2)
    assert np.array_equal(got3["topk_idx"],
                          np.asarray(want2["topk_idx"])[:, :2])

    # asymmetric grow failure: the leader's local re-shard "OOMs" while
    # the follower's succeeds — the agree vote must unwind the follower
    # back to the old corpus (a t_real divergence would deadlock every
    # later collective) and the pod must keep answering consistently
    inner = svc._scorer._scorer
    orig_grow = inner.grow

    def _boom(rows):
        raise MemoryError("induced grow failure")

    inner.grow = _boom
    try:
        svc.add_targets(_seqs(rng, 2))
        raise SystemExit("expected the induced grow failure to raise")
    except MemoryError:
        pass
    inner.grow = orig_grow
    assert svc._scorer.t_real == 17  # unchanged
    got4 = svc.query(queries, want=("sim", "topk"), topk=3)
    assert np.allclose(got4["sim"], want2["sim"], rtol=1e-4, atol=1e-5)
    assert np.array_equal(got4["topk_idx"],
                          np.asarray(want2["topk_idx"])[:, :3])

    svc.stop_followers()
    svc.stop_followers()  # idempotent: a second STOP must not hang
    try:  # post-stop requests fail fast instead of hanging a collective
        svc.query(queries, want=("topk",), topk=2)
        raise SystemExit("expected post-stop query to fail")
    except RuntimeError as err:
        assert "stopped" in str(err), err
    print("DIST_OK p0", flush=True)


if __name__ == "__main__":
    main()
