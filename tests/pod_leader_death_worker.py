"""Worker for the dead-LEADER pod-liveness test (roadmap #4 closure).

Driver kills process 0 (the leader) while the service is IDLE.  The
follower sits in ``follow()``'s header wait — unbounded before round
4's heartbeat; now the leader beacons every timeout_s/3 and the
follower bounds its wait at 3x timeout_s, so a dead leader releases
the follower instead of pinning it in the collective forever.  The
idle period before the kill exceeds the header timeout, proving the
heartbeats (not traffic) are what keep the follower waiting.

``python pod_leader_death_worker.py <coordinator> <n> <pid> <sync>``
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4").strip()
os.environ["SEEKR_TPU_POD_TIMEOUT"] = "6"  # header timeout 18 s

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 3


def _seqs(rng, n, lo=80, hi=160):
    letters = np.array(list("AGTC"))
    return ["".join(letters[rng.integers(0, 4, rng.integers(lo, hi))])
            for _ in range(n)]


def main():
    coordinator, n_procs, pid, sync = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from seekr_tpu.parallel.dist import init_distributed
    from seekr_tpu.parallel.mesh import make_mesh

    init_distributed(coordinator=coordinator, num_processes=n_procs,
                     process_id=pid)

    from seekr_tpu.serve import SeekrService

    rng = np.random.default_rng(13)
    mean = rng.normal(1.0, 0.1, 4 ** K).astype(np.float32)
    std = rng.normal(1.0, 0.05, 4 ** K).astype(np.float32)
    svc = SeekrService(mean, std, k=K, targets=_seqs(rng, 8),
                       mesh=make_mesh(jax.devices()))

    if pid == 0:
        # leader: one warm query, then idle (heartbeats only) until the
        # driver SIGKILLs us
        out = svc.query(_seqs(rng, 2), want=("topk",), topk=3)
        assert out["topk_idx"] is not None
        open(os.path.join(sync, "warm"), "w").close()
        time.sleep(3600)
        return

    # follower: the idle period after warm (driver waits ~20 s > the
    # 18 s header timeout before killing the leader) is survived thanks
    # to the heartbeats; the dead leader then releases us within the
    # header timeout (watchdog) or immediately (Gloo peer-loss error)
    t0 = time.time()
    try:
        svc.follow()
        print("FOLLOW_RETURNED_UNEXPECTEDLY", flush=True)
    except BaseException as e:  # noqa: BLE001 — any prompt release is
        elapsed = time.time() - t0  # the contract
        print(f"FOLLOWER_RELEASED after {elapsed:.1f}s "
              f"({type(e).__name__})", flush=True)
    sys.stdout.flush()
    os._exit(0)  # skip the doomed jax.distributed shutdown barrier


if __name__ == "__main__":
    main()
