"""Warm-resident similarity service (extension; production serving path).

The CLI commands are one-shot processes: every invocation re-reads the
background artifacts and (without a warm AOT store) re-compiles the
device executables.  For serving — many small query batches against one
fixed background — the right shape is a resident process that loads
everything once and answers queries with warm executables:

    svc = SeekrService(mean="mean.npy", std="std.npy", k=6,
                       targets="gencode.fa", fitres=fitres)
    svc.warmup()
    out = svc.query(["AGTC...", ...], want=("sim", "pvals"))

``serve_forever`` exposes the service over a UNIX domain socket with a
newline-delimited-JSON protocol (zero dependencies, local-only by
construction — binding a network port is the deployment layer's job):

    request:  {"seqs": ["AGTC..", ...], "want": ["sim", "pvals"]}
    response: {"ok": true, "sim": [[...]], "pvals": [[...]],
               "m": Q, "n": T}
    top-k mode: {"seqs": [...], "want": ["topk", "topk_pvals"],
                 "topk": 10} -> {"topk_sim": [[Q x 10]], "topk_idx":
                 [[...]], "topk_names": [[...]], "topk_pvals": [[...]]}
    (nearest-target selection runs ON DEVICE via lax.top_k — only the
    [Q, topk] result crosses to the host, never the [Q, T] matrix)
    artifact mode (large results): add "outfile": "/path/prefix" and the
    matrices are written as <prefix>_sim.npy / <prefix>_pvals.npy with
    the paths returned in "files" instead of inline JSON.  Client-
    directed writes (outfile, save_corpus) are OPT-IN: rejected unless
    ``serve_forever(..., artifact_dir=DIR)`` / ``--allow-artifacts DIR``
    was given, and then confined to DIR.  The socket itself is created
    owner-only (0600)
    errors:   {"ok": false, "error": "..."}
    ops:      {"op": "ping"} -> {"ok": true, "k": .., "targets": ..,
                                 "queries_served": .., "device_batches":
                                 .., "latency": {count/p50/p95/p99/max
                                 of the last <=1024 requests, ms}}
              {"op": "add_targets", "seqs": [...], "names": [...]} or
              {"op": "add_targets", "fasta": "/path.fa"} -> {"ok": true,
                "n": new_total, "added": N} — append targets to the
                resident corpus without a restart (append-only;
                existing indices never change)
              {"op": "save_corpus", "path": "corpus.npz"} -> {"ok":
                true, "path": ...} — snapshot the resident standardized
                corpus (including live growth); a service restarted
                with targets="corpus.npz" skips counting the target
                fasta and scores bit-identically
              {"op": "shutdown"} -> {"ok": true} (server exits)

Counting/normalize/Pearson run the same device path as the CLI
(count_graph -> normalize -> pearson_device), so results are identical
to ``seekr_kmer_counts`` + ``seekr_pearson`` + ``seekr_find_pval``
artifacts — pinned by tests/test_serve.py.
"""

from __future__ import annotations

import collections
import functools
import json
import os
import socket
import socketserver
import threading
import time
from typing import Optional, Sequence

import numpy as np

_MAX_REQUEST = 256 << 20  # 256 MB of request line is a caller bug

# Batches up to this many rows take the serving single-bucket encode
# policy (compiled-shape reuse over minimal padding — see _seq_counter);
# larger batches are bulk loads and keep the throughput-oriented
# bucketed encode.  1024 comfortably covers any query batch (the
# coalesce cap and warmup grid top out far below it).
_SINGLE_BUCKET_MAX_ROWS = 1024


def _topk_impl_factory():
    """Build the jitted device top-k lazily (keeps jax import off the
    module path — the client-side ``request`` helper must stay usable in
    processes that never touch a device)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n", "mask_cols"))
    def _topk(sim, limit, n, mask_cols):
        if mask_cols:
            # columns >= limit are not selectable targets: in self-
            # similarity mode they are the padded dummy ROWS' copies
            # (see _pad_batch), in targets mode the width-quantization
            # pad rows (zero vectors, sim 0 — which would beat every
            # negative correlation).  Masked to -inf so top_k can only
            # pick real targets.  limit is a traced scalar: one
            # executable serves every real count within a padded shape.
            cols = jnp.arange(sim.shape[1], dtype=jnp.int32) < limit
            sim = jnp.where(cols[None, :], sim, -jnp.inf)
        return jax.lax.top_k(sim, n)

    return _topk


def _default_corpus_budget():
    """Default corpus memory budget: half the device's HBM limit.

    The resident corpus shares HBM with query batches, the [Q, T]
    similarity output, and compiled executables, so only a fraction is
    budgeted to it.  Backends that do not report memory stats (CPU test
    meshes) get no default budget — growth is then unbounded unless the
    caller passes ``mem_budget_bytes`` or sets SEEKR_TPU_CORPUS_BUDGET.
    """
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        limit = stats.get("bytes_limit") if stats else None
    except Exception:
        return None
    return int(limit) // 2 if limit else None


def _atomic_write(path: str, write_fn, suffix: str) -> None:
    """Write-then-rename: ``write_fn(fh)`` fills a temp file in the
    target's directory, os.replace publishes it.  A crash never leaves
    a truncated artifact at ``path``, and a symlink racing into the
    path after a policy check is REPLACED, not followed (os.replace
    renames over the link itself).  Shared by the .npz corpus snapshot
    and the .npy artifact-mode writes."""
    import tempfile

    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(os.path.abspath(path)), suffix=suffix)
    try:
        with os.fdopen(fd, "wb") as fh:
            write_fn(fh)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _atomic_npy_save(path: str, arr: np.ndarray) -> None:
    _atomic_write(path, lambda fh: np.save(fh, arr), ".npy.tmp")


_TOPK_IMPL = None


class _PendingQuery:
    """One in-flight request in the coalescing queue (see query())."""

    __slots__ = ("seqs", "want", "topk", "done", "result", "error")

    def __init__(self, seqs, want, topk):
        self.seqs = seqs
        self.want = want
        self.topk = topk
        self.done = threading.Event()
        self.result = None
        self.error = None


class SeekrService:
    """Preloaded background + warm executables; thread-safe queries."""

    def __init__(self, mean, std, k: int = 6, log2: str = "Log2.post",
                 targets=None, fitres=None, coalesce: bool = True,
                 mesh=None, mem_budget_bytes=None, grow_quantum: int = 256):
        """mean/std: .npy path or [4^k] array (the background norm
        vectors).  targets: fasta path or list of sequences — queries
        are scored against these (default: against the query batch
        itself).  fitres: find_dist output (list of fitted tuples or a
        raw r-value array) enabling "pvals".  coalesce: merge requests
        that arrive while the device is busy into one device batch
        (targets mode only; results identical either way).  mesh: a
        jax.sharding.Mesh — the standardized targets are row-sharded
        over EVERY mesh device (a corpus too big for one chip's HBM
        lives as ~T/D rows per chip) and top-k runs as a two-stage
        distributed selection (parallel.dist.make_sharded_scorer).

        mem_budget_bytes: cap on resident-corpus device bytes (per
        device on a mesh).  ``add_targets`` past the budget returns an
        actionable refusal instead of a mid-serve OOM.  Default: half
        the device's reported HBM limit (SEEKR_TPU_CORPUS_BUDGET
        overrides; 0 disables the cap; backends without memory stats
        get no default cap).

        grow_quantum: the resident corpus width is padded up to a
        multiple of this many rows FROM THE INITIAL LOAD (zero rows,
        masked out of top-k and sliced out of sim), so N small grows
        mint O(range/quantum) compiled executables instead of N — each
        new corpus WIDTH is a fresh compile key for every batch shape —
        and a within-quantum grow changes no shape at all (existing
        targets' scores stay bit-identical).  Snapshots and all results
        see only real rows.  0/1 disables quantization."""
        from seekr_tpu.models.counter import KmerCounter

        self.k = int(k)
        self.log2 = log2
        self.mean = np.load(mean) if isinstance(mean, str) else np.asarray(mean)
        self.std = np.load(std) if isinstance(std, str) else np.asarray(std)
        if len(self.mean) != 4 ** self.k or len(self.std) != 4 ** self.k:
            raise ValueError(
                f"norm vectors must have 4^k = {4 ** self.k} entries for "
                f"k={self.k} (got {len(self.mean)}/{len(self.std)})")
        self.fitres = fitres
        self._sorted_bkg = None  # lazily sorted empirical background
        self._counter_cls = KmerCounter
        self._lock = threading.Lock()
        self.coalesce = bool(coalesce)
        self.grow_quantum = max(1, int(grow_quantum))
        if mem_budget_bytes is None:
            env = os.environ.get("SEEKR_TPU_CORPUS_BUDGET")
            if env:
                try:
                    mem_budget_bytes = int(env)
                except ValueError:
                    raise ValueError(
                        f"SEEKR_TPU_CORPUS_BUDGET must be an integer byte "
                        f"count (0 disables the cap), got {env!r}") from None
                if mem_budget_bytes <= 0:
                    mem_budget_bytes = None  # 0 = unlimited, by convention
            else:
                mem_budget_bytes = _default_corpus_budget()
        self.mem_budget_bytes = mem_budget_bytes
        # one merged device batch never exceeds this many query rows
        # (pre-padding): bounds the compiled-shape space and the HBM
        # high-water mark under heavy fan-in.  warmup() tightens this
        # to the largest shape it actually compiled, so a warmed
        # service can never hit a fresh backend compile mid-burst.
        self.max_coalesce_rows = 512
        self._queue: list = []
        self._queue_lock = threading.Lock()
        self.queries_served = 0
        self.device_batches = 0  # device passes actually run (telemetry)
        # client-observed per-request latency (enqueue -> answer, i.e.
        # including any coalescing wait), last 1024 requests — enough
        # for stable p99 at a bounded, constant memory cost
        self._latencies = collections.deque(maxlen=1024)
        self._lat_lock = threading.Lock()

        # the STANDARDIZED target matrix lives on device for the process
        # lifetime: uploaded once, standardized once (every query's
        # Pearson skips the re-standardize HBM pass — bitwise-identical,
        # same graph, hoisted), and the raw normalized copy is NOT kept —
        # at GENCODE scale it would hold 213 MB of HBM purely as a flag.
        # get_counts_device keeps the whole count+normalize chain
        # device-resident too, so only the [Q, T] similarity matrix ever
        # crosses to the host per query.
        self.target_names = None
        self._targets_std = None
        self._scorer = None
        self._has_targets = targets is not None
        self._n_targets = 0
        if mesh is not None and targets is None:
            raise ValueError("mesh serving requires targets: the sharded "
                             "corpus IS the thing being distributed")
        if targets is not None:
            from seekr_tpu.ops.pearson import standardize_rows

            if isinstance(targets, str) and targets.endswith(".npz"):
                # corpus snapshot (save_corpus): the standardized matrix
                # is already computed — a restart skips counting the
                # whole target fasta (the expensive part of load)
                tstd, self.target_names = self._load_corpus(targets)
            elif isinstance(targets, str):
                counter = KmerCounter(targets, k=self.k, mean=self.mean,
                                      std=self.std, log2=log2, silent=True)
                tstd = standardize_rows(counter.get_counts_device())
                self.target_names = [h[1:] for h in counter.headers]
            else:
                # nan_check on: this is the one-time load path — a std
                # vector zero (k-mer absent from the background) would
                # otherwise poison every future query silently
                tstd = standardize_rows(
                    self._count(list(targets), nan_check=True))
                self.target_names = [f"t{i}" for i in range(len(targets))]
            self._n_targets = len(self.target_names)
            if mesh is not None:
                from seekr_tpu.parallel.dist import make_sharded_scorer

                # one host crossing at load time: laying out the shards
                # needs the host buffer.  The scorer keeps it as the
                # re-shard shadow for add_targets (213 MB at GENCODE
                # k=6 — host RAM, not HBM); the resident copy on the
                # default device is dropped.  On a multi-host mesh this
                # returns a PodScorer (leader/follower broadcast
                # protocol — see follow()).
                self._mesh = mesh
                self._scorer = make_sharded_scorer(
                    mesh, np.asarray(tstd), row_quantum=self.grow_quantum)
            else:
                import jax.numpy as jnp

                self._mesh = None
                # no-copy for arrays standardize_rows already left on
                # device; uploads once for a snapshot's host matrix.
                # Width-quantized from the INITIAL load (zero pad rows,
                # masked in top-k, sliced from sim): the resident width
                # is the compile key of every sim/topk executable, so a
                # within-quantum grow changes no shape — and therefore
                # no score, bit for bit.
                self._targets_std = self._quantize_pad(jnp.asarray(tstd))
            over = self._corpus_bytes_over(self._resident_rows())
            if over:
                print(f"seekr_tpu serve: WARNING {over} — queries may "
                      "OOM; raise mem_budget_bytes or shard over a mesh "
                      "(-dp N)", flush=True)
            from seekr_tpu.parallel.dist import PodScorer

            if isinstance(self._scorer, PodScorer) and self._scorer.is_leader:
                # liveness beacon under the device lock: followers bound
                # their idle wait on it (follow), and a dead follower is
                # detected within one interval even with zero traffic
                self._scorer.heartbeat_start(self._lock)

    def _quantize_pad(self, tstd):
        """Pad a standardized target matrix with zero rows up to the
        next ``grow_quantum`` multiple (see __init__)."""
        import jax.numpy as jnp

        t = int(tstd.shape[0])
        padded = -(-t // self.grow_quantum) * self.grow_quantum
        if padded == t:
            return tstd
        return jnp.concatenate(
            [tstd, jnp.zeros((padded - t, tstd.shape[1]), jnp.float32)],
            axis=0)

    def _resident_rows(self) -> int:
        """Device-resident corpus rows INCLUDING quantization pad."""
        if self._scorer is not None:
            return self._scorer.t_loc * getattr(self._scorer, "n_dev",
                                                self._scorer.mesh.size)
        return (int(self._targets_std.shape[0])
                if self._targets_std is not None else 0)

    def _corpus_bytes_over(self, rows_padded: int):
        """Budget check: per-device resident-corpus bytes for a padded
        row count vs ``mem_budget_bytes``.  Returns a message with the
        measured numbers when over, None when within (or no budget)."""
        if self.mem_budget_bytes is None:
            return None
        n_dev = self._scorer.n_dev if self._scorer is not None else 1
        per_dev_rows = -(-rows_padded // n_dev)
        need = per_dev_rows * (4 ** self.k) * 4  # float32
        if need <= self.mem_budget_bytes:
            return None
        return (f"resident corpus would need {need:,} bytes/device "
                f"({per_dev_rows:,} rows x {4 ** self.k:,} cols x 4 B"
                f"{f' over {n_dev} devices' if n_dev > 1 else ''}), over "
                f"the {self.mem_budget_bytes:,}-byte corpus budget")

    def _load_corpus(self, path: str):
        """Load a ``save_corpus`` snapshot: the standardized target
        matrix + names, validated against THIS service's artifacts.

        The snapshot bakes in k, log2 and the norm vectors (the matrix
        is a function of all three), so a mismatch would silently score
        queries against a corpus normalized differently than the
        queries themselves — rejected loudly instead.
        """
        with np.load(path, allow_pickle=False) as z:
            missing = {"format", "tstd", "names", "k", "log2",
                       "mean", "std"} - set(z.files)
            if missing:
                raise ValueError(f"{path} is not a seekr_tpu corpus "
                                 f"snapshot (missing {sorted(missing)})")
            fmt = int(z["format"])
            if fmt != 1:
                raise ValueError(f"corpus snapshot format {fmt} is newer "
                                 "than this seekr_tpu (supports 1)")
            if int(z["k"]) != self.k or str(z["log2"]) != self.log2:
                raise ValueError(
                    f"corpus snapshot was built with k={int(z['k'])}, "
                    f"log2={z['log2']}; this service runs k={self.k}, "
                    f"log2={self.log2}")
            if (not np.array_equal(z["mean"], self.mean)
                    or not np.array_equal(z["std"], self.std)):
                raise ValueError(
                    "corpus snapshot was standardized with DIFFERENT "
                    "norm vectors than this service's mean/std — "
                    "rebuild the snapshot from the target fasta")
            tstd = np.asarray(z["tstd"], np.float32)
            names = [str(n) for n in z["names"]]
        if tstd.ndim != 2 or tstd.shape[1] != 4 ** self.k:
            raise ValueError(f"corpus snapshot matrix is {tstd.shape}, "
                             f"want [T, {4 ** self.k}]")
        if len(names) != tstd.shape[0]:
            raise ValueError(f"corpus snapshot has {tstd.shape[0]} rows "
                             f"but {len(names)} names")
        return tstd, names

    def save_corpus(self, path: str) -> str:
        """Write the resident corpus as a restartable snapshot (.npz).

        Captures the STANDARDIZED target matrix (including any
        ``add_targets`` growth), the target names, and the artifacts it
        was built with (k, log2, mean, std — validated at load).  A new
        service started with ``targets=<path>`` skips counting the
        target fasta entirely, which is the expensive part of a cold
        start; scores are bit-identical to the fasta-loaded service
        because the exact standardized float32 rows round-trip.

        Snapshot vs fasta: the snapshot is 4^k floats/row regardless of
        sequence length (larger than the fasta for short transcripts,
        far smaller for long ones) and loads at disk speed instead of
        count speed.  Taken under the device lock, so a snapshot racing
        ``add_targets`` is either fully before or fully after the grow.
        """
        if not self._has_targets:
            raise ValueError("service started without targets: "
                             "self-similarity mode has no corpus to save")
        if not path.endswith(".npz"):
            # np.savez would append .npz anyway; require it up front so
            # the path the caller stores is the path load recognizes
            raise ValueError("corpus snapshot path must end in .npz")
        with self._lock:
            # slice off any width-quantization pad rows: snapshots hold
            # only the real corpus (the mesh host shadow is unpadded)
            host = np.asarray(self._scorer.host_corpus
                              if self._scorer is not None
                              else self._targets_std[:self._n_targets],
                              np.float32)
            names = np.asarray(self.target_names)
        # write-then-rename (_atomic_write): a crash or ENOSPC mid-write
        # must never leave a truncated .npz at the exact path a restart
        # script passes to -t (load would fail with an opaque zipfile
        # error instead of the friendly validation ones)
        _atomic_write(
            path,
            lambda fh: np.savez(fh, format=np.int64(1), tstd=host,
                                names=names, k=np.int64(self.k),
                                log2=np.asarray(self.log2),
                                mean=self.mean, std=self.std),
            ".npz.tmp")
        return path

    def follow(self) -> None:
        """Follower entry point for multi-host (pod) serving.

        Every process constructs the SAME SeekrService (same artifacts,
        same fasta, same mesh); process 0 then runs the socket server
        while every other process calls ``follow()`` and mirrors the
        leader's device calls until the leader's shutdown releases it
        (parallel.dist.PodScorer).  Returns after STOP.

        The leader service heartbeats (see __init__), so the idle wait
        is bounded at 3x the pod watchdog timeout: a dead or partitioned
        leader raises here (the process should exit and be restarted)
        instead of pinning this process in the collective forever.
        """
        from seekr_tpu.parallel.dist import PodScorer

        if not isinstance(self._scorer, PodScorer):
            raise ValueError("follow() is for multi-host mesh serving: "
                             "this service has no pod scorer")
        if self._scorer.is_leader:
            raise ValueError("process 0 is the leader: run the socket "
                             "server here, follow() on the others")
        t = self._scorer.timeout_s  # None = watchdog disabled
        self._scorer.follow(header_timeout=3 * t if t else None)

    def stop_followers(self) -> None:
        """Release pod followers (no-op single-host / single-process).
        Leader-only; call once, after the last device call."""
        from seekr_tpu.parallel.dist import PodScorer

        if isinstance(self._scorer, PodScorer) and self._scorer.is_leader:
            with self._lock:  # never interleave STOP with a device call
                self._scorer.stop()

    def _seq_counter(self, seqs: Sequence[str]):
        """In-memory counter with the SERVING bucket policy: one length
        bucket, padded to the batch max (power of two).

        Bucketed encode minimizes count FLOPs, but a latency-bound query
        path cares about compiled-shape reuse, not FLOPs (the padded
        count work is microseconds on the MXU): every novel mix of
        length buckets is a novel assemble shape, and a fresh backend
        compile mid-traffic costs ~1 s over a remote link (BASELINE.md
        round-5 serve-jitter note).  A single bucket keyed on
        (padded rows, padded max length) makes every query land on the
        warmup grid.  Sequences past the long-sequence threshold keep
        their own chunked path and don't inflate the floor.
        """
        counter = self._counter_cls(None, k=self.k, mean=self.mean,
                                    std=self.std, log2=self.log2,
                                    silent=True)
        counter.seqs = list(seqs)
        # Latency policy only for query-sized batches: a one-time bulk
        # load (the 13k-target corpus, a large add_targets) is
        # throughput-bound, and padding every row to the corpus max
        # would multiply its host encode + upload bytes for a compile
        # space nobody re-enters.  Counting is row-local and
        # bucket-invariant (integer window sums are exact in f32), so
        # the policy switch cannot change any value.
        if len(counter.seqs) <= _SINGLE_BUCKET_MAX_ROWS:
            from seekr_tpu.io.encode import pick_bucket_length
            from seekr_tpu.models.counter import _LONG_SEQ_THRESHOLD

            short_max = max((len(s) for s in counter.seqs
                             if len(s) <= _LONG_SEQ_THRESHOLD), default=0)
            if short_max:
                counter.min_bucket_len = pick_bucket_length(short_max,
                                                            self.k)
        return counter

    def _count(self, seqs: Sequence[str], nan_check: bool = False):
        """Device-resident normalized counts of in-memory sequences.

        ``nan_check`` defaults OFF: the probe is a blocking device sync
        per call, which the per-query path cannot afford — the one-time
        target-load path turns it back on.
        """
        return self._seq_counter(seqs).get_counts_device(nan_check=nan_check)

    def _count_raw(self, seqs: Sequence[str]):
        """Device-resident RAW counts-per-kb (no normalize epilogue) —
        the coalesced path applies the segmented epilogue itself."""
        return self._seq_counter(seqs)._raw_counts_device()

    @staticmethod
    def _pad_batch(seqs: Sequence[str]):
        """Pad a query batch to the next power of two with dummy rows.

        The encode buckets are power-of-two in (rows, length), but the
        normalize/Pearson graphs compile per EXACT row count — without
        padding, every new batch size is a fresh backend compile (a
        latency cliff mid-traffic).  Padding bounds the compile space to
        O(log max_batch) shapes; the dummy rows' sim/pval rows are
        sliced off before anything is returned.  Row results are
        independent in every stage (row-local normalize, per-row GEMM
        output), so padding does not change the real rows.

        The pad rows are COPIES of the last real sequence, not synthetic
        filler: the Log2.post epilogue shifts by the GLOBAL matrix min
        (reference kmer_counts.py:207-209), so a row with new values
        would change every cell — a duplicate row cannot change a min.
        (Exact only because the service always normalizes with PROVIDED
        mean/std vectors; under computed stats a duplicate row would
        shift the column means — do not reuse this trick there.)
        """
        q = len(seqs)
        padded = 1
        while padded < q:
            padded *= 2
        return list(seqs) + [seqs[-1]] * (padded - q)

    def warmup(self, lengths=(512, 1024, 2048), max_batch: int = 16,
               topk: int = 10) -> None:
        """Compile (or AOT-load) the bucket executables before traffic.

        Covers query batches up to ``max_batch`` at the given sequence
        lengths: batch padding (power-of-two rows) plus the serving
        single-bucket policy (one bucket at the power-of-two batch max,
        ``_seq_counter``) make this the WHOLE compile space for any
        traffic whose longest sequence is <= max(lengths) — including
        the device top-k executable for sizes up to ``topk``.  List
        every power of two from the shortest to the longest expected
        query length; with a warm AOT store the loop loads executables
        instead of compiling.

        Runs under the device lock: on a pod the scorer calls below ride
        the ordered broadcast channel, and the liveness heartbeat (also
        serialized on this lock) must never interleave a PING into the
        middle of a warmup op's header/payload pair.
        """
        with self._lock:
            self._warmup_locked(lengths, max_batch, topk)

    def _warmup_locked(self, lengths, max_batch, topk):
        rng = np.random.default_rng(0)
        letters = np.array(list("AGTC"))
        sizes, b = [], 1
        while b <= max_batch:
            sizes.append(b)
            b *= 2
        for L in lengths:
            for q in sizes:
                seqs = ["".join(letters[rng.integers(0, 4, size=L)])
                        for _ in range(q)]
                qc = self._count(self._pad_batch(seqs))
                sim_dev = self._sim_device(qc)
                np.asarray(sim_dev)
                if topk:
                    if self._scorer is not None:
                        # all three scorer executables: topk-only,
                        # sim+topk (mixed requests), and sim (warmed
                        # above) each have their own compiled graph
                        self._mesh_topk(qc, q, topk)
                        self._mesh_topk(qc, q, topk, with_sim=True)
                    else:
                        self._topk_device(sim_dev, q, topk)
        if self.coalesce and self._has_targets:
            # the coalesced path's segmented epilogue compiles per
            # (padded rows, n_segments): cover the (q, segments<=q)
            # power-of-two grid so the first real merge is warm too —
            # and cap merges at the largest shape EVER warmed, so a
            # fan-in burst can never force a fresh backend compile
            # while holding the device lock.  Across warmups the cap is
            # the max of the warmed sizes (earlier warmups' executables
            # stay resident): a later warmup(max_batch=64) RAISES the
            # cap — min() here would make that documented knob a no-op
            if not hasattr(self, "_coalesce_hard_cap"):
                # the pre-warmup cap (ctor default or operator override)
                self._coalesce_hard_cap = self.max_coalesce_rows
            self._warmed_rows = max(getattr(self, "_warmed_rows", 0),
                                    max(sizes))
            self.max_coalesce_rows = min(self._coalesce_hard_cap,
                                         self._warmed_rows)
            from seekr_tpu.ops.normalize import normalize_counts_segmented

            for q in sizes:
                if q < 2:
                    continue
                seqs = ["".join(letters[rng.integers(0, 4, size=lengths[0])])
                        for _ in range(q)]
                raw = self._count_raw(self._pad_batch(seqs))
                segs = 2
                while segs <= q:
                    seg_ids = np.minimum(np.arange(len(seqs), dtype=np.int32)
                                         * segs // len(seqs), segs - 1)
                    seg_ids = np.concatenate(
                        [seg_ids, np.full(len(raw) - len(seqs), segs - 1,
                                          np.int32)])
                    np.asarray(normalize_counts_segmented(
                        raw, seg_ids, segs, log2_mode=self.log2,
                        mean=self.mean, std=self.std)[:1, :1])
                    segs *= 2

    def add_targets(self, seqs=None, names=None, fasta=None):
        """Append targets to the resident corpus without a restart.

        Exactly one of ``seqs`` (list of sequences, optional ``names``)
        or ``fasta`` (path; headers become names).  New rows are
        counted and standardized with the SAME background norm vectors
        as the originals, then appended to the device-resident
        standardized matrix (single-device) or re-sharded over the mesh
        from the host shadow copy.  The swap happens under the device
        lock, so it is atomic w.r.t. queries: existing target indices
        never change (append-only by design — removing rows would
        renumber indices clients may have stored; restart to shrink),
        and requests queued when the update lands are answered against
        the grown corpus.  A grow that stays within the current
        ``grow_quantum`` width changes no compiled shape (scores of
        existing targets are bit-identical, nothing recompiles); a grow
        that crosses a quantum boundary pays one recompile per batch
        shape for the new width.  A grow past ``mem_budget_bytes`` is
        refused with the measured numbers.  Returns
        ``(new_total, rows_added)``.

        Normalization is BATCH-LOCAL under Log2.post (the global-|min|
        shift sees only the rows counted together — reference
        kmer_counts.py:207-209), so added rows score exactly as if the
        new fasta had been counted by its own seekr_kmer_counts run and
        the artifacts concatenated; already-resident rows are never
        renormalized, which is what keeps their scores and indices
        stable across updates.  A fresh service loading everything in
        one batch would shift all rows by the COMBINED min instead —
        equally faithful, different chain (pinned by tests).
        """
        if not self._has_targets:
            raise ValueError("service started without targets: "
                             "self-similarity mode has no corpus to grow")
        if (seqs is None) == (fasta is None):
            raise ValueError("add_targets takes exactly one of "
                             "seqs / fasta")
        from seekr_tpu.ops.pearson import standardize_rows

        # count + standardize OUTSIDE the lock: the device serializes
        # execution anyway, but in-flight queries keep being answered
        # while the new rows are prepared
        if fasta is not None:
            counter = self._counter_cls(fasta, k=self.k, mean=self.mean,
                                        std=self.std, log2=self.log2,
                                        silent=True)
            new_std = standardize_rows(
                counter.get_counts_device(nan_check=True))
            new_names = [h[1:] for h in counter.headers]
        else:
            seqs = list(seqs)
            if not seqs:
                raise ValueError("empty target batch")
            if names is not None and len(names) != len(seqs):
                raise ValueError(f"{len(names)} names for "
                                 f"{len(seqs)} sequences")
            new_std = standardize_rows(self._count(seqs, nan_check=True))
            new_names = list(names) if names is not None else None
        added = int(np.shape(new_std)[0])
        with self._lock:
            if new_names is None:
                # auto-numbering reads _n_targets UNDER the lock —
                # concurrent updates must not mint duplicate names
                new_names = [f"t{i}"
                             for i in range(self._n_targets,
                                            self._n_targets + len(seqs))]
            new_total = self._n_targets + added
            # budget gate BEFORE any device upload: a grow past the
            # budget is refused with the measured numbers instead of
            # OOMing mid-serve (VERDICT r3)
            prospective = (self._scorer.prospective_rows(new_total)
                           if self._scorer is not None
                           else -(-new_total // self.grow_quantum)
                           * self.grow_quantum)
            over = self._corpus_bytes_over(prospective)
            if over:
                raise ValueError(
                    f"add_targets refused: {over}.  The resident corpus "
                    f"stays at {self._n_targets} targets; raise "
                    "mem_budget_bytes / SEEKR_TPU_CORPUS_BUDGET or shard "
                    "over a larger mesh (-dp N).")
            if self._scorer is not None:  # mesh: re-shard the shadow
                # the scorer drops its old shards before the grown
                # corpus uploads and restores them on failure (and on a
                # pod, broadcasts the rows so every process re-shards)
                self._scorer.grow(np.asarray(new_std))
            else:
                import jax.numpy as jnp

                new_j = jnp.asarray(new_std, jnp.float32)
                cur_pad = int(self._targets_std.shape[0])
                if new_total <= cur_pad:
                    # the new rows fit in the existing quantization pad:
                    # write them in place — the resident WIDTH (= the
                    # compile key of every sim/topk executable) does not
                    # change, so this grow recompiles nothing
                    self._targets_std = (
                        self._targets_std.at[self._n_targets:new_total]
                        .set(new_j))
                else:
                    # width grows: quantize up so the NEXT
                    # (quantum - new_total % quantum) grows are free
                    parts = [self._targets_std[:self._n_targets], new_j]
                    pad = prospective - new_total
                    if pad:
                        parts.append(jnp.zeros(
                            (pad, self._targets_std.shape[1]),
                            jnp.float32))
                    self._targets_std = jnp.concatenate(parts, axis=0)
            self.target_names = list(self.target_names) + new_names
            self._n_targets = len(self.target_names)
        return self._n_targets, len(new_names)

    def _sim_device(self, qc):
        """DEVICE [Q, T] similarity vs the resident standardized targets
        (or [Q, Q] self-similarity without targets) — nothing crosses."""
        from seekr_tpu.ops.pearson import (pearson_against_standardized,
                                           pearson_device)

        if not self._has_targets:
            return pearson_device(qc, qc)
        if self._scorer is not None:  # mesh-sharded corpus
            return self._scorer.sim(qc)
        return pearson_against_standardized(qc, self._targets_std)

    def _mesh_topk(self, qc, q: int, topk: int, with_sim: bool = False):
        """Two-stage distributed top-k over the mesh-sharded corpus —
        straight from the normalized counts; the full [Q, T] row never
        exists on any single device.  Same power-of-two executable
        bounding and slicing contract as _topk_device.  With
        ``with_sim`` the (column-sharded) similarity matrix rides the
        SAME shard-local GEMM — a mixed sim+topk request must not pay
        the corpus contraction twice — returned as
        ``(sim_dev, vals, idx)``."""
        n_req = max(1, min(int(topk), self._n_targets))
        n_run = 1
        while n_run < n_req:
            n_run *= 2
        n_run = min(n_run, self._n_targets)
        if with_sim:
            sim_dev, vals, idx = self._scorer.sim_and_topk(qc, n_run)
        else:
            vals, idx = self._scorer.topk(qc, n_run)
        out = (np.asarray(vals)[:q, :n_req],
               np.asarray(idx)[:q, :n_req])
        return (sim_dev,) + out if with_sim else out

    def _topk_device(self, sim_dev, q: int, topk: int):
        """Top-``topk`` targets per real query row, selected ON DEVICE.

        Only [q, topk] values + indices cross to the host instead of the
        full [Q, T] matrix — the fetch (and on real hardware the PCIe
        pass) shrinks by T/topk, which dominates large-batch query
        latency (BASELINE.md serving table).  top_k runs at the next
        power of two >= topk (then slices) so the compiled-executable
        space stays O(log T) across requested sizes; ties break toward
        the lower index (lax.top_k), deterministically.
        """
        from seekr_tpu.utils.aot import aot_call

        global _TOPK_IMPL
        if _TOPK_IMPL is None:
            _TOPK_IMPL = _topk_impl_factory()
        self_sim = not self._has_targets
        t_cols = int(sim_dev.shape[1])
        # only the first `limit` columns are selectable: the real batch
        # rows in self-similarity mode, the real (un-quantization-pad)
        # targets otherwise — pad columns are zero rows whose sim of 0
        # would beat any negative correlation
        limit = q if self_sim else self._n_targets
        n_req = max(1, min(int(topk), limit))
        n_run = 1
        while n_run < n_req:
            n_run *= 2
        n_run = min(n_run, t_cols)
        # the mask decision must be STABLE across in-place grows: with a
        # grow quantum, a grow that exactly fills the pad would flip
        # `limit < t_cols` False and mint a new static key — a mid-serve
        # recompile the width-quantization guarantee forbids.  Masking
        # with limit == t_cols is a semantic no-op (every column is
        # selectable), so quantized services always mask.
        mask = self_sim or self.grow_quantum > 1 or limit < t_cols
        vals, idx = aot_call(_TOPK_IMPL, (sim_dev, limit),
                             dict(n=n_run, mask_cols=mask))
        return (np.asarray(vals)[:q, :n_req],
                np.asarray(idx)[:q, :n_req])

    def _pvals(self, sim: np.ndarray) -> np.ndarray:
        if self.fitres is None:
            raise ValueError("service started without fitres: pvals "
                             "unavailable (pass fitres= / --fitres)")
        if isinstance(self.fitres, np.ndarray):
            if self._sorted_bkg is None:
                from seekr_tpu.ops.ecdf import SortedBackground

                # sort once for the process: every query pays only the
                # searchsorted, not an O(N log N) re-sort of the fitres
                self._sorted_bkg = SortedBackground(self.fitres)
            return np.asarray(self._sorted_bkg.pvals(sim), dtype=sim.dtype)
        distname, _, params = self.fitres[0]
        from seekr_tpu.stats.fast_cdf import fast_cdf

        cdf = fast_cdf(distname, params, sim)
        if cdf is None:
            from scipy import stats as spstats

            cdf = getattr(spstats, distname)(*params).cdf(sim)
        return (1.0 - cdf).astype(sim.dtype)

    def query(self, seqs: Sequence[str], want: Sequence[str] = ("sim",),
              topk: int = 10):
        """Score a query batch against the resident targets.

        ``want`` items (combine freely):
          sim         full [Q, T] similarity matrix
          pvals       full [Q, T] p-value matrix (needs fitres)
          topk        topk_sim/topk_idx [Q, topk]: the best ``topk``
                      targets per query, selected on device — the full
                      matrix never crosses to the host
          topk_pvals  p-values of the top-k values (implies topk)

        T = preloaded target count (or Q for self-similarity, where
        top-k draws from the batch's real rows only).  Thread-safe: one
        device computation at a time (queries queue briefly; the device
        itself is serial anyway).
        """
        t0 = time.perf_counter()
        out = self._query(seqs, want, topk)
        # successful requests only: a rejected request never touches
        # the device and would skew the latency distribution down
        with self._lat_lock:
            self._latencies.append(time.perf_counter() - t0)
        return out

    def latency_stats(self):
        """Client-observed latency of the last <=1024 successful
        queries (including coalescing wait), in milliseconds."""
        with self._lat_lock:
            snap = np.asarray(self._latencies, dtype=np.float64)
        if snap.size == 0:
            return {"count": 0}
        q50, q95, q99 = np.percentile(snap, (50, 95, 99)) * 1e3
        return {"count": int(snap.size),
                "p50_ms": round(float(q50), 3),
                "p95_ms": round(float(q95), 3),
                "p99_ms": round(float(q99), 3),
                "max_ms": round(float(snap.max() * 1e3), 3)}

    def _query(self, seqs, want, topk):
        want = set(want)
        unknown = want - {"sim", "pvals", "topk", "topk_pvals"}
        if unknown:
            raise ValueError(f"unknown want items: {sorted(unknown)} "
                             "(supported: sim, pvals, topk, topk_pvals)")
        if not seqs:
            raise ValueError("empty query batch")
        if "topk_pvals" in want:
            want.add("topk")
        if want & {"pvals", "topk_pvals"} and self.fitres is None:
            raise ValueError("service started without fitres: pvals "
                             "unavailable (pass fitres= / --fitres)")
        if not self._has_targets or not self.coalesce:
            # self-similarity answers depend on the batch itself and
            # cannot be merged with other requests; serial path
            with self._lock:
                out = self._serve_one(list(seqs), want, topk)
                self.queries_served += 1
                self.device_batches += 1
            return out
        # request coalescing (leader/follower): enqueue, then take the
        # device lock.  Whichever thread gets it first drains EVERYTHING
        # queued meanwhile — including requests from other connections —
        # into one device batch; threads arriving to find their answer
        # already computed just return it.  Requests therefore merge
        # exactly when the device is the bottleneck, with no added
        # latency when it is idle (no timer, no background thread).
        item = _PendingQuery(list(seqs), want, int(topk))
        with self._queue_lock:
            self._queue.append(item)
        # an item is set done only UNDER the device lock, so while we
        # hold the lock with our item undone, it is provably still
        # queued.  The timed acquire keeps followers responsive: a
        # thread whose answer lands while it is contending returns
        # within the poll interval instead of waiting behind the NEXT
        # leader's whole device pass (Lock wakeup is not FIFO).
        while not item.done.is_set():
            if not self._lock.acquire(timeout=0.01):
                continue
            try:
                # leader loop: drain FIFO batches of up to
                # max_coalesce_rows (always >= 1 item) until our own
                # request has been served — an unbounded merge could
                # jump to a padded shape no warmup ever covered (fresh
                # compile + HBM spike mid-traffic).  Items left queued
                # after ours is done are picked up by their owners.
                while not item.done.is_set():
                    with self._queue_lock:
                        batch, rows = [], 0
                        while self._queue and (
                                not batch or
                                rows + len(self._queue[0].seqs)
                                <= self.max_coalesce_rows):
                            nxt = self._queue.pop(0)
                            batch.append(nxt)
                            rows += len(nxt.seqs)
                    self._serve_coalesced(batch)
            finally:
                self._lock.release()
        if item.error is not None:
            raise item.error
        return item.result

    def _serve_one(self, seqs, want, topk):
        """One request through the device, caller holds the lock."""
        q = len(seqs)
        # power-of-two padding bounds the compiled-shape space (see
        # _pad_batch); the dummy rows are sliced off before returning
        qc = self._count(self._pad_batch(seqs))
        out = {"m": q, "n": self._n_targets if self._has_targets else q}
        # the full [Q, T] matrix is needed for sim/pvals, and for top-k
        # only on the single-device path (the mesh scorer selects
        # straight from the counts, shard by shard); a mesh request
        # wanting both rides ONE shard-local GEMM (sim_and_topk)
        sim_dev = None
        need_full = bool(want & {"sim", "pvals"})
        if "topk" in want:
            if self._scorer is not None:
                if need_full:
                    sim_dev, vals, idx = self._mesh_topk(qc, q, topk,
                                                         with_sim=True)
                else:
                    vals, idx = self._mesh_topk(qc, q, topk)
            else:
                sim_dev = self._sim_device(qc)
                vals, idx = self._topk_device(sim_dev, q, topk)
            out["topk_sim"] = vals
            out["topk_idx"] = idx
            if "topk_pvals" in want:
                out["topk_pvals"] = self._pvals(vals)
        elif need_full:
            sim_dev = self._sim_device(qc)
        if "sim" in want or "pvals" in want:
            sim = np.asarray(sim_dev)
            # mesh scorer output is padded to a device-count multiple of
            # columns; single-device paths are exact-width (the slice is
            # then a no-op view)
            sim = (sim[:q, :self._n_targets] if self._has_targets
                   else sim[:q, :q])
            if "sim" in want:
                out["sim"] = sim
            if "pvals" in want:
                out["pvals"] = self._pvals(sim)
        return out

    def _serve_coalesced(self, batch):
        """Answer every queued request with ONE device pass.

        All requests' rows are counted together and normalized with the
        SEGMENTED Log2.post epilogue (ops.normalize), so each request's
        global-|min| shift sees only its own rows — the one cross-row
        coupling in the pipeline.  Counting and the shift are bitwise
        what the serial path computes per request; the Pearson GEMM may
        retile for the merged row count, so sim can differ from serial
        at float-reassociation (ulp) level — same math, same precision
        path (pinned by tests/test_serve.py).
        """
        try:
            if len(batch) == 1:
                item = batch[0]
                try:
                    item.result = self._serve_one(item.seqs, item.want,
                                                  item.topk)
                    self.queries_served += 1
                except Exception as err:  # noqa: BLE001 — boundary
                    item.error = err
                self.device_batches += 1
                return
            all_seqs, spans = [], []
            for item in batch:
                spans.append((len(all_seqs), len(item.seqs)))
                all_seqs.extend(item.seqs)
            padded = self._pad_batch(all_seqs)
            seg_ids = np.empty(len(padded), np.int32)
            for si, (start, ln) in enumerate(spans):
                seg_ids[start:start + ln] = si
            # pad rows are copies of the LAST sequence: same segment as
            # its owner, where a duplicate row cannot change the min
            seg_ids[len(all_seqs):] = len(batch) - 1
            n_segments = 1
            while n_segments < len(batch):
                n_segments *= 2

            from seekr_tpu.ops.normalize import normalize_counts_segmented

            counts = normalize_counts_segmented(
                self._count_raw(padded), seg_ids, n_segments,
                log2_mode=self.log2, mean=self.mean, std=self.std)
            t_cols = self._n_targets

            topk_items = [it for it in batch if "topk" in it.want]
            need_full = any(it.want & {"sim", "pvals"} for it in batch)
            sim_dev = None
            vals = idx = None
            if topk_items:
                # one device top-k at the largest size any request wants;
                # smaller requests take a prefix of the sorted row.  On
                # the mesh a merged batch wanting both products rides
                # ONE shard-local GEMM (sim_and_topk), same as serial.
                n_max = max(max(1, min(it.topk, t_cols))
                            for it in topk_items)
                if self._scorer is not None:
                    if need_full:
                        sim_dev, vals, idx = self._mesh_topk(
                            counts, len(padded), n_max, with_sim=True)
                    else:
                        vals, idx = self._mesh_topk(counts, len(padded),
                                                    n_max)
                else:
                    sim_dev = self._sim_device(counts)
                    vals, idx = self._topk_device(sim_dev, len(padded),
                                                  n_max)
            elif need_full:
                sim_dev = self._sim_device(counts)
            # mesh sim is column-padded to a device-count multiple
            sim_np = (np.asarray(sim_dev)[:, :t_cols] if need_full
                      else None)
            for item, (start, ln) in zip(batch, spans):
                try:
                    out = {"m": ln, "n": t_cols}
                    if "topk" in item.want:
                        n_req = max(1, min(item.topk, t_cols))
                        out["topk_sim"] = vals[start:start + ln, :n_req]
                        out["topk_idx"] = idx[start:start + ln, :n_req]
                        if "topk_pvals" in item.want:
                            out["topk_pvals"] = self._pvals(out["topk_sim"])
                    if item.want & {"sim", "pvals"}:
                        s = sim_np[start:start + ln]
                        if "sim" in item.want:
                            out["sim"] = s
                        if "pvals" in item.want:
                            out["pvals"] = self._pvals(s)
                    item.result = out
                    self.queries_served += 1
                except Exception as err:  # noqa: BLE001 — boundary
                    item.error = err
            self.device_batches += 1
        except Exception:  # noqa: BLE001 — merged-pass failure
            # one bad request must not poison its batchmates: replay
            # each item alone (serial semantics) so only the offender
            # errors.  Rare path — the device lock is still held.
            for item in batch:
                if item.result is not None or item.error is not None:
                    continue
                try:
                    item.result = self._serve_one(item.seqs, item.want,
                                                  item.topk)
                    self.queries_served += 1
                except Exception as err:  # noqa: BLE001 — boundary
                    item.error = err
                self.device_batches += 1
        finally:
            for item in batch:
                item.done.set()


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        while True:
            line = self.rfile.readline(_MAX_REQUEST)
            if not line:
                return
            if len(line) >= _MAX_REQUEST and not line.endswith(b"\n"):
                # readline hit the cap mid-line: without this, the
                # line's REMAINDER would be parsed as the next request —
                # protocol desync instead of a clean reject (VERDICT
                # r3).  Drain the rest of the logical line, answer one
                # error, and stay in sync for the next request.
                while True:
                    rest = self.rfile.readline(_MAX_REQUEST)
                    if not rest or rest.endswith(b"\n"):
                        break
                self.wfile.write(json.dumps(
                    {"ok": False,
                     "error": f"request line exceeds {_MAX_REQUEST} "
                              "bytes"}).encode() + b"\n")
                self.wfile.flush()
                continue
            try:
                req = json.loads(line)
                resp = self._dispatch(req)
            except Exception as err:  # protocol boundary: report, not die
                resp = {"ok": False,
                        "error": f"{type(err).__name__}: {err}"}
            shutdown = isinstance(resp, dict) and resp.pop("_shutdown", False)
            self.wfile.write(json.dumps(resp).encode() + b"\n")
            self.wfile.flush()
            if shutdown:
                # after the response is on the wire
                threading.Thread(target=self.server.shutdown,
                                 daemon=True).start()
                return

    def _check_artifact_path(self, path: str) -> str:
        """Enforce the server's artifact-write policy on a client path.

        The socket is a privilege boundary: without a policy, any local
        process that can reach it could use ``outfile``/``save_corpus``
        to write .npy/.npz files to ANY path the service user can write
        (VERDICT r3).  Artifact writes are therefore opt-in: the server
        must be started with an allowed directory (``--allow-artifacts``)
        and every client-supplied path must resolve inside it — symlinks
        and ``..`` are resolved first, so a link pointing outside the
        directory is rejected too.  Returns the resolved absolute path.
        """
        allow = getattr(self.server, "artifact_dir", None)
        if allow is None:
            raise PermissionError(
                "artifact writes over the socket are disabled: start "
                "the server with --allow-artifacts DIR to permit "
                "outfile/save_corpus paths under DIR")
        base = os.path.realpath(allow)
        apath = os.path.abspath(path)
        if os.path.lexists(apath):
            # an existing final component may itself be a symlink a
            # co-writer planted — resolve the WHOLE path
            resolved = os.path.realpath(apath)
        else:
            # realpath the DIRECTORY (ancestors may be symlinks) and
            # rejoin the final name, which need not exist yet
            resolved = os.path.join(
                os.path.realpath(os.path.dirname(apath)),
                os.path.basename(apath))
        # STRICTLY inside: a path equal to the directory itself would
        # turn the outfile prefix into sibling files outside it
        # (prefix + "_sim.npy")
        if not resolved.startswith(base + os.sep):
            raise PermissionError(
                f"artifact path {path!r} resolves outside the allowed "
                f"directory {base!r}")
        return resolved

    def _dispatch(self, req):
        svc: SeekrService = self.server.service  # type: ignore[attr-defined]
        op = req.get("op", "query")
        if op == "ping":
            return {"ok": True, "k": svc.k, "log2": svc.log2,
                    "targets": (len(svc.target_names)
                                if svc.target_names else None),
                    "pvals_available": svc.fitres is not None,
                    "queries_served": svc.queries_served,
                    "device_batches": svc.device_batches,
                    "latency": svc.latency_stats()}
        if op == "add_targets":
            n, added = svc.add_targets(req.get("seqs"),
                                       names=req.get("names"),
                                       fasta=req.get("fasta"))
            return {"ok": True, "n": n, "added": added}
        if op == "save_corpus":
            path = req.get("path")
            if not path:
                return {"ok": False,
                        "error": "save_corpus needs 'path' (.npz)"}
            return {"ok": True,
                    "path": svc.save_corpus(
                        self._check_artifact_path(path))}
        if op == "shutdown":
            return {"ok": True, "_shutdown": True}
        if op != "query":
            return {"ok": False, "error": f"unknown op {op!r}"}
        # validate the artifact prefix BEFORE the device pass: a request
        # whose outfile will be rejected must not burn device time first
        outfile = req.get("outfile")
        prefix = self._check_artifact_path(outfile) if outfile else None
        out = svc.query(req["seqs"], want=tuple(req.get("want", ["sim"])),
                        topk=int(req.get("topk", 10)))
        resp = {"ok": True, "m": out["m"], "n": out["n"]}
        if req.get("names") and svc.target_names is not None:
            # full target-name list on demand (clients labeling full
            # sim/pvals CSV columns); not in every response — at GENCODE
            # scale the list is megabytes of JSON
            resp["target_names"] = svc.target_names
        # top-k results are small ([Q, topk]) — always inline, with
        # indices resolved to target names when the service has them
        for key in ("topk_sim", "topk_idx", "topk_pvals"):
            if key in out:
                resp[key] = np.asarray(out[key]).tolist()
        if "topk_idx" in out and svc.target_names is not None:
            resp["topk_names"] = [[svc.target_names[j] for j in row]
                                  for row in out["topk_idx"]]
        if prefix:
            # artifact mode: large results go to disk as the standard
            # .npy artifacts (JSON-encoding a 13k-column matrix would
            # dominate the request).  Each FINAL path is policy-checked
            # (the prefix check above fails fast pre-compute, but the
            # actual files carry a suffix it cannot see) — ALL paths
            # before ANY write, so a rejection cannot leave a partial
            # artifact set; the write itself is temp + os.replace,
            # which clobbers rather than follows a symlink planted in
            # the check-to-write window
            paths = {key: self._check_artifact_path(f"{prefix}_{key}.npy")
                     for key in ("sim", "pvals") if key in out}
            for key, path in paths.items():
                _atomic_npy_save(path, np.asarray(out[key]))
            resp["files"] = paths
            return resp
        for key in ("sim", "pvals"):
            if key in out:
                resp[key] = np.asarray(out[key]).tolist()
        return resp


class _Server(socketserver.ThreadingUnixStreamServer):
    daemon_threads = True
    allow_reuse_address = True


def serve_forever(service: SeekrService, socket_path: str,
                  ready_event: Optional[threading.Event] = None,
                  artifact_dir: Optional[str] = None) -> None:
    """Blocking accept loop; remove a stale socket file first.  On exit
    (shutdown op) any pod followers are released.

    The socket is created owner-only (0600): any local user who could
    reach it could otherwise shut the service down, poison the corpus
    via add_targets, or direct artifact writes (VERDICT r3).  The mode
    is enforced via umask BEFORE bind — chmod-after-bind would leave a
    connectable window.  ``artifact_dir`` opts in to client-directed
    disk writes (outfile / save_corpus), confined to that directory;
    None (default) rejects them with an actionable error.
    """
    try:
        os.unlink(socket_path)
    except FileNotFoundError:
        pass
    old_umask = os.umask(0o177)  # bind() creates the socket file 0600
    try:
        server_cm = _Server(socket_path, _Handler)
    finally:
        os.umask(old_umask)
    try:
        with server_cm as server:
            server.service = service  # type: ignore[attr-defined]
            server.artifact_dir = artifact_dir  # type: ignore[attr-defined]
            if ready_event is not None:
                ready_event.set()
            server.serve_forever()
    finally:
        service.stop_followers()
        try:
            os.unlink(socket_path)
        except FileNotFoundError:
            pass


def request(socket_path: str, payload: dict, timeout: float = 600.0) -> dict:
    """One-shot client: send a request dict, return the response dict."""
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as sock:
        sock.settimeout(timeout)
        sock.connect(socket_path)
        sock.sendall(json.dumps(payload).encode() + b"\n")
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = sock.recv(1 << 20)
            if not chunk:
                break
            buf += chunk
    return json.loads(buf)
