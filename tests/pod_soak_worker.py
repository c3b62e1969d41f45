"""Worker for the pod soak test: concurrent socket traffic + live
grows + heartbeats over a 2-process pod.

The pod protocol serializes every device call behind the leader's lock
and rides an ordered broadcast channel; this soak drives the pieces
TOGETHER — 4 client threads of mixed topk/sim queries, interleaved
add_targets grows, the liveness heartbeat beaconing throughout (the
short SEEKR_TPU_POD_TIMEOUT makes PINGs frequent) — and asserts
protocol invariants under load plus a clean shutdown.

``python pod_soak_worker.py <coordinator> <n> <pid>``
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4").strip()
os.environ["SEEKR_TPU_POD_TIMEOUT"] = "30"  # PING every 10 s

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 3
N_CLIENTS = 4
N_REQUESTS = 12


def _seqs(rng, n, lo=80, hi=160):
    letters = np.array(list("AGTC"))
    return ["".join(letters[rng.integers(0, 4, rng.integers(lo, hi))])
            for _ in range(n)]


def main():
    coordinator, n_procs, pid = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]))

    from seekr_tpu.parallel.dist import init_distributed
    from seekr_tpu.parallel.mesh import make_mesh

    init_distributed(coordinator=coordinator, num_processes=n_procs,
                     process_id=pid)

    from seekr_tpu.serve import SeekrService

    rng = np.random.default_rng(17)
    mean = rng.normal(1.0, 0.1, 4 ** K).astype(np.float32)
    std = rng.normal(1.0, 0.05, 4 ** K).astype(np.float32)
    svc = SeekrService(mean, std, k=K, targets=_seqs(rng, 11),
                       mesh=make_mesh(jax.devices()), grow_quantum=16)

    if pid != 0:
        svc.follow()
        print(f"DIST_OK p{pid}", flush=True)
        return

    import tempfile
    import threading

    from seekr_tpu.serve import request, serve_forever

    sock = os.path.join(tempfile.mkdtemp(), "soak.sock")
    ready = threading.Event()
    srv = threading.Thread(target=serve_forever, args=(svc, sock, ready),
                           daemon=True)
    srv.start()
    assert ready.wait(60)

    errors = []

    def client(cid):
        crng = np.random.default_rng(100 + cid)
        try:
            for i in range(N_REQUESTS):
                q = _seqs(crng, int(crng.integers(1, 4)))
                want = ["topk"] if crng.integers(0, 2) else ["sim"]
                resp = request(sock, {"seqs": q, "want": want,
                                      "topk": 4}, timeout=120)
                assert resp["ok"], resp
                n_t = resp["n"]
                if "topk_idx" in resp:
                    idx = np.asarray(resp["topk_idx"])
                    # indices always point at REAL targets, never at a
                    # quantization pad column, even mid-grow
                    assert idx.max() < n_t, (idx.max(), n_t)
                else:
                    assert len(resp["sim"][0]) == n_t
                if cid == 0 and i % 4 == 1:
                    # live grow riding the same broadcast channel
                    g = request(sock, {"op": "add_targets",
                                       "seqs": _seqs(crng, 2)},
                                timeout=120)
                    assert g["ok"], g
        except Exception as e:  # noqa: BLE001 — reported by the main
            errors.append(f"client {cid}: {type(e).__name__}: {e}")

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(N_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "client wedged"
    assert not errors, errors

    pong = request(sock, {"op": "ping"})
    assert pong["ok"]
    assert pong["queries_served"] >= N_CLIENTS * N_REQUESTS
    # grows: 3 per grow-client pass, corpus grew accordingly
    assert pong["targets"] > 11

    down = request(sock, {"op": "shutdown"})
    assert down["ok"]
    srv.join(timeout=60)
    assert not srv.is_alive()
    print("DIST_OK p0", flush=True)


if __name__ == "__main__":
    main()
