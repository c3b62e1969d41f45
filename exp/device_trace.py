"""Device-op breakdown of any jitted callable via jax.profiler xplanes.

The axon tunnel distorts wall-clock timing (dispatch floor, queue gaps),
so kernel work must be attributed from the device trace itself.  This
wraps the capture + xplane parsing used to find the count-kernel flatten
relayout (BASELINE.md "Flatten-relayout discovery"): it runs ``fn`` a
few times under ``jax.profiler.trace`` and prints per-op device totals
from the /device:TPU plane.

Library use:
    from exp.device_trace import device_op_breakdown
    rows = device_op_breakdown(lambda: fn(args), iters=5)

CLI smoke (traces the bench pipeline at a small m):
    python exp/device_trace.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# tensorflow's bundled xplane protos predate the installed protobuf's
# C++ codegen; the pure-python fallback parses them fine
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def device_op_breakdown(thunk, iters: int = 5, plane_substr: str = "TPU"):
    """Run ``thunk()`` ``iters`` times under the profiler; return
    ``[(ms_per_iter, count, op_name), ...]`` sorted by device time.

    ``thunk`` must itself force completion of its outputs (e.g. fetch a
    tiny slice) — on the tunnel ``block_until_ready`` is unreliable, so
    the caller owns synchronization.
    """
    import jax
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    if iters < 1:
        raise ValueError("iters must be >= 1")
    d = tempfile.mkdtemp(prefix="seekr_trace_")
    try:
        with jax.profiler.trace(d):
            for _ in range(iters):
                thunk()
        paths = glob.glob(f"{d}/**/*.xplane.pb", recursive=True)
        if not paths:
            raise RuntimeError("profiler produced no xplane file")
        agg = {}
        for path in paths:  # multi-host/chip captures shard across files
            xs = xplane_pb2.XSpace()
            with open(path, "rb") as f:
                xs.ParseFromString(f.read())
            for p in xs.planes:
                if plane_substr not in p.name:
                    continue
                meta = {m.id: m.name for m in p.event_metadata.values()}
                for line in p.lines:
                    for ev in line.events:
                        nm = meta.get(ev.metadata_id, "?")
                        a = agg.setdefault(nm, [0, 0])
                        a[0] += ev.duration_ps
                        a[1] += 1
        rows = [(dur / iters / 1e9, cnt, nm)
                for nm, (dur, cnt) in agg.items()]
        return sorted(rows, reverse=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    import jax

    from seekr_tpu.models.pipeline import SeekrPipeline

    rng = np.random.default_rng(0)
    m, lmax = 512, 1024
    lengths = rng.integers(256, lmax, size=m).astype(np.int32)
    bases = rng.integers(0, 4, size=(m, lmax)).astype(np.int8)
    for i, ln in enumerate(lengths):
        bases[i, ln:] = 4
    bd, nd = jax.device_put(bases), jax.device_put(lengths)
    fn = jax.jit(SeekrPipeline(k=6).forward)
    out = fn(bd, nd)
    np.asarray(out[0, :1])  # warm + compile

    def thunk():
        out = fn(bd, nd)
        np.asarray(out[0, :1])
        return out

    for ms, cnt, name in device_op_breakdown(thunk)[:12]:
        print(f"  {ms:8.3f} ms/iter x{cnt:4d}  {name[:95]}")


if __name__ == "__main__":
    main()
