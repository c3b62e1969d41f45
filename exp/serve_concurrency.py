"""Concurrent-client serving throughput: request coalescing quantified.

N client threads each send single-sequence queries back-to-back against
a GENCODE-scale resident target set.  With coalescing (default), the
leader/follower queue merges whatever arrived while the device was busy
into one device batch (segmented Log2.post epilogue keeps per-request
results identical to serial — ops/normalize.py); without, requests
serialize one device pass each.  The ratio is the production-serving
story under load, where per-pass latency is round-trip-bound.

Run: python exp/serve_concurrency.py [--targets 13000] [--clients 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 6


def synth_seqs(n, rng, l_min=512, l_max=2048):
    letters = np.array(list("AGTC"))
    return ["".join(letters[rng.integers(0, 4, rng.integers(l_min, l_max))])
            for _ in range(n)]


def run_load(svc, n_clients, per_client, want, topk):
    done = []
    lock = threading.Lock()

    def client(cid):
        rng = np.random.default_rng(1000 + cid)
        lat = []
        for _ in range(per_client):
            seqs = synth_seqs(1, rng)
            t0 = time.perf_counter()
            svc.query(seqs, want=want, topk=topk)
            lat.append(time.perf_counter() - t0)
        with lock:
            done.extend(lat)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat = np.sort(done)
    return wall, lat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", type=int, default=13000)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--per-client", type=int, default=8)
    ap.add_argument("--topk", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    mean = rng.uniform(0.0, 2.0, 4 ** K)
    std = rng.uniform(0.5, 2.0, 4 ** K)

    from seekr_tpu.serve import SeekrService

    print(f"loading service: {args.targets} targets ...", file=sys.stderr)
    svc = SeekrService(mean=mean, std=std, k=K,
                       targets=synth_seqs(args.targets, rng))
    svc.warmup()
    want = ("topk",)

    for coalesce in (False, True):
        svc.coalesce = coalesce
        svc.device_batches = svc.queries_served = 0
        # warm the coalesced-path executables (segmented normalize) at
        # the batch shapes this load will hit, outside the timed region
        wall, lat = run_load(svc, args.clients, 2, want, args.topk)
        svc.device_batches = svc.queries_served = 0
        wall, lat = run_load(svc, args.clients, args.per_client, want,
                             args.topk)
        n = args.clients * args.per_client
        print(f"coalesce={coalesce}: {n} queries / {wall:.2f} s = "
              f"{n / wall:6.1f} queries/s   p50 {np.median(lat)*1e3:6.1f} ms"
              f"   device batches {svc.device_batches} "
              f"(avg merge {n / max(1, svc.device_batches):.1f}x)")


if __name__ == "__main__":
    main()
