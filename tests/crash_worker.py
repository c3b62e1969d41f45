"""Child worker for the streamed-writer crash-consistency tests.

Launched by tests/test_stream_crash.py as
``python crash_worker.py <mode> <workdir>``; the parent SIGKILLs it
mid-stream.  The writer classes are slowed (a short sleep per appended
block) so the kill deterministically lands inside the output phase —
the production code path is otherwise unmodified.

Modes:
  adj   adj_pval_stream of a disk .npy (CSV + .npy sinks, tiny chunks)
  pval  find_pval with stream=True (CSV + .npy sinks, 1-row tiles)
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the axon sitecustomize re-pins

import numpy as np  # noqa: E402

import seekr_tpu.io.stream as st  # noqa: E402

_orig_csv_append = st.StreamingCsvWriter.append
_orig_npy_append = st.StreamingNpyWriter.append


def _slow(orig):
    def append(self, block):
        orig(self, block)
        time.sleep(0.05)
    return append


st.StreamingCsvWriter.append = _slow(_orig_csv_append)
st.StreamingNpyWriter.append = _slow(_orig_npy_append)


def main():
    mode, workdir = sys.argv[1], sys.argv[2]
    os.chdir(workdir)
    if mode == "adj":
        from seekr_tpu.stats.stream_adj import adj_pval_stream

        adj_pval_stream("pvals_in.npy", "fdr_bh", outputname="adj_out",
                        out_npy="adj_out.npy", symmetric=False,
                        chunk_cells=1 << 12)
    elif mode == "pval":
        from seekr_tpu.stats.find_pval import find_pval

        fitres = np.load("fitres.npy")
        find_pval("q.fa", "q.fa", "mean.npy", "std.npy", 2, fitres,
                  log2="Log2.post", outputname="pval_out",
                  npy_out="pval_out.npy", stream=True, stream_block_rows=1,
                  progress_bar=False)
    elif mode == "pval_mem":
        # oracle for the streamed run, SAME (CPU) backend as the child:
        # a TPU-backend parent process would differ by ~1e-5 in r, which
        # moves empirical p-values by whole 1/N grid steps
        from seekr_tpu.stats.find_pval import find_pval

        fitres = np.load("fitres.npy")
        want = find_pval("q.fa", "q.fa", "mean.npy", "std.npy", 2, fitres,
                         log2="Log2.post", stream=False, progress_bar=False)
        np.save("pval_want.npy", want.values)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print("CRASH_WORKER_DONE", flush=True)


if __name__ == "__main__":
    main()
