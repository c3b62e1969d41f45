"""Streamed emission of huge matrices (tiled Pearson at GENCODE scale).

SURVEY.md hard part 5: m up to ~180k rows makes the all-pairs r-matrix up to
10^10 cells — it must never exist as one host array.  These writers consume
[block, m2] tiles as they come off the device:

  * ``StreamingNpyWriter`` — writes a standard .npy by pre-writing the header
    for the full shape and appending row blocks (float32 C-order).
  * ``StreamingCsvWriter`` — appends labeled/unlabeled CSV row blocks
    (the reference's '%1.6f' unlabeled format or pandas-style labeled).

``stream_pearson`` drives the blocked device GEMM through a writer.
"""

from __future__ import annotations

import os

import numpy as np

# Above this many output cells, row blocks are streamed instead of
# materializing the full matrix on host.  One policy shared by
# models.pearson (internal blocking) and cli (stream-vs-materialize);
# lives here so the CLI can read it without importing jax.
STREAM_CELL_THRESHOLD = 64_000_000


class StreamingNpyWriter:
    """Row-block appender producing a valid .npy for a known final shape.

    Crash-consistent (VERDICT r4 #8): all bytes go to ``<path>.part`` and
    ``close()`` publishes with fsync + ``os.replace`` only after the full
    row count arrived — a crashed or failed run leaves the final path
    either absent or complete (never truncated), and a restart simply
    rewrites the ``.part``.  Same discipline as the serve corpus
    snapshots (serve.py).
    """

    def __init__(self, path: str, shape, dtype=np.float32):
        self.path = path if str(path).endswith(".npy") else f"{path}.npy"
        self.shape = tuple(int(s) for s in shape)
        self.dtype = np.dtype(dtype)
        self._tmp = self.path + ".part"
        self._fh = open(self._tmp, "wb")
        header = {"descr": self.dtype.str, "fortran_order": False,
                  "shape": self.shape}
        np.lib.format.write_array_header_2_0(self._fh, header)
        self._rows_written = 0

    def append(self, block: np.ndarray):
        block = np.ascontiguousarray(block, dtype=self.dtype)
        assert block.ndim == 2 and block.shape[1] == self.shape[1]
        self._rows_written += block.shape[0]
        assert self._rows_written <= self.shape[0], "wrote too many rows"
        self._fh.write(block.tobytes())

    def close(self):
        if getattr(self, "_done", False):
            return  # idempotent: a second close must not touch anything
        if self._rows_written != self.shape[0]:
            msg = (f"expected {self.shape[0]} rows, "
                   f"wrote {self._rows_written}")
            self.discard()  # an incomplete artifact must never publish
            raise AssertionError(msg)
        self._fh.flush()
        os.fsync(self._fh.fileno())
        self._fh.close()
        os.replace(self._tmp, self.path)
        self._done = True

    def discard(self):
        """Drop any in-flight ``.part`` without touching the final path.

        Safe after close() (nothing in flight) and idempotent — callers
        use it as the blanket cleanup in error paths.
        """
        if getattr(self, "_done", False):
            return
        if not self._fh.closed:
            self._fh.close()
        try:
            os.unlink(self._tmp)
        except FileNotFoundError:
            pass
        self._done = True

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.close()
        else:
            self.discard()


class ArrayCollector:
    """Writer that accumulates streamed row blocks into one host array."""

    def __init__(self):
        self.blocks = []

    def append(self, block):
        self.blocks.append(np.asarray(block))

    def result(self) -> np.ndarray:
        return np.vstack(self.blocks)


class TriuCollector:
    """Writer reducing streamed self-similarity tiles to the strict upper
    triangle on the fly.

    find_dist only ever consumes ``triu(sim, 1)`` of the background r-matrix
    (seekr/find_dist.py:160-163); collecting the full [m, m] square first —
    676 MB at the default 13k background, 130 GB at the 180k GENCODE
    extreme — was VERDICT r2 weak #2.  This writer keeps each row's j > i
    tail as the [block, m] tiles come off the device, so peak host memory is
    the m(m-1)/2 triangle itself and the square never exists.

    Output is bit-identical to ``utils.adj.triu_values`` of the collected
    matrix (row-major row tails), pinned by tests/test_streaming.py.
    """

    def __init__(self, m: int, dtype=np.float32):
        self.m = int(m)
        self.dtype = np.dtype(dtype)
        self._row = 0
        # preallocated: the triangle is the ONLY full-size buffer this
        # class ever holds (a parts-list + final concatenate would peak
        # at 2x the triangle = the square this class exists to avoid)
        self._out = np.empty(self.m * (self.m - 1) // 2, dtype=self.dtype)
        self._fill = 0

    def append(self, block):
        block = np.asarray(block)
        assert block.ndim == 2 and block.shape[1] == self.m
        for bi in range(block.shape[0]):
            i = self._row + bi
            tail = self.m - (i + 1)
            self._out[self._fill:self._fill + tail] = block[bi, i + 1:]
            self._fill += tail
        self._row += block.shape[0]

    def result(self) -> np.ndarray:
        assert self._row == self.m, (
            f"expected {self.m} rows, saw {self._row}")
        out = self._out
        self._out = np.empty(0, dtype=self.dtype)
        return out


class StreamingCsvWriter:
    """Row-block CSV appender (labeled like pandas, or raw %1.6f).

    Labels are quoted with csv's minimal quoting so names containing commas
    (legal in FASTA headers) round-trip exactly like the pandas ``to_csv``
    path used for sub-threshold matrices.

    float32 blocks go through the multithreaded native formatter
    (native/src/csvio.cpp, the same pandas-byte-exact mode 0 / '%1.6f'
    mode 1 the one-shot artifact writers use) in append mode — per-cell
    Python ``%`` interpolation at streaming scale (>64M cells, the only
    regime this writer runs in) would cost minutes where the native path
    costs seconds.  The '%s' fallback writes NaN as an empty cell to
    match both pandas ``to_csv`` and the native mode-0 formatter, so
    artifact bytes do not depend on whether the native toolchain was
    available.

    Crash-consistent like StreamingNpyWriter (VERDICT r4 #8): rows
    accumulate in ``<path>.part``; ``close()`` fsyncs and publishes via
    ``os.replace``, so a killed run leaves the final path untouched and
    a restart rewrites the ``.part`` from scratch.
    """

    def __init__(self, path: str, columns=None, row_labels=None,
                 fmt: str = "%1.6f"):
        from seekr_tpu.io.fast_csv import _quote  # one quoting policy

        self.path = path
        self._tmp = f"{path}.part"
        self.fmt = fmt
        self.row_labels = list(row_labels) if row_labels is not None else None
        self.labeled = columns is not None
        if self.labeled and self.row_labels is None:
            # fail before the header hits the disk: every labeled append
            # slices row_labels, so deferring this to the first block
            # would leave a partial artifact behind a TypeError
            raise ValueError("StreamingCsvWriter: columns= requires "
                             "row_labels= (a labeled CSV has both)")
        self._quote = _quote
        # '%s' on float32 equals pandas shortest-repr bytes (mode 0)
        # except NaN; '%1.6f' is mode 1 — other fmts take the fallback
        self._native_mode = {"%s": 0, "%1.6f": 1}.get(fmt)
        with open(self._tmp, "w") as fh:
            if self.labeled:
                fh.write("," + ",".join(_quote(c) for c in columns) + "\n")
        self._row = 0

    def _native_append(self, block: np.ndarray) -> bool:
        is_f64 = block.dtype == np.float64 and self._native_mode == 0
        if self._native_mode is None or (block.dtype != np.float32
                                         and not is_f64):
            return False
        try:
            from seekr_tpu import native
        except ImportError:
            return False
        if not native.native_available():
            return False
        labels = None
        if self.labeled:
            labels = [self._quote(l) for l in
                      self.row_labels[self._row:self._row + block.shape[0]]]
        if is_f64:
            # float64 blocks (the streamed adj_pval emitter): Python-repr
            # bytes == pandas DataFrame(float64).to_csv
            native.write_csv_f64(self._tmp, np.ascontiguousarray(block),
                                 header_line=None, row_label_cells=labels,
                                 append=True)
        else:
            native.write_csv_f32(self._tmp, np.ascontiguousarray(block),
                                 header_line=None, row_label_cells=labels,
                                 mode=self._native_mode, append=True)
        return True

    def append(self, block: np.ndarray):
        block = np.asarray(block)
        if self._native_append(block):
            self._row += block.shape[0]
            return
        with open(self._tmp, "a") as fh:
            for row in block:
                if self._native_mode == 0:
                    # pandas/native mode 0 writes NaN as an empty cell;
                    # '%s' % nan would write 'nan' and make the bytes
                    # depend on native availability (ADVICE r2)
                    cells = ",".join("" if v != v else "%s" % v
                                     for v in row)
                else:
                    cells = ",".join(self.fmt % v for v in row)
                if self.labeled:
                    label = self._quote(self.row_labels[self._row])
                    fh.write(f"{label},{cells}\n")
                else:
                    fh.write(cells + "\n")
                self._row += 1

    def close(self):
        """Publish the accumulated rows atomically.

        Labeled writers know their final row count (one label per row),
        so like StreamingNpyWriter a shortfall discards instead of
        publishing a truncated artifact.  Idempotent; never recreates a
        missing ``.part`` (a close after discard is a no-op, not a
        zero-byte publish over a valid file).
        """
        if getattr(self, "_done", False):
            return
        if self.labeled and self._row != len(self.row_labels):
            msg = (f"expected {len(self.row_labels)} rows, "
                   f"wrote {self._row}")
            self.discard()
            raise AssertionError(msg)
        if not os.path.exists(self._tmp):
            raise FileNotFoundError(
                f"{self._tmp} missing at close (discarded or externally "
                "removed); refusing to publish")
        with open(self._tmp, "a") as fh:
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(self._tmp, self.path)
        self._done = True

    def discard(self):
        """Drop any in-flight ``.part`` without touching the final path.

        Safe after close() and idempotent (blanket error-path cleanup).
        """
        if getattr(self, "_done", False):
            return
        try:
            os.unlink(self._tmp)
        except FileNotFoundError:
            pass
        self._done = True

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.close()
        else:
            self.discard()


def _pearson_block_impl(a, b):
    import jax
    import jax.numpy as jnp

    from seekr_tpu.ops.precision import pearson_precision

    d = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=pearson_precision(),
    )
    return d / a.shape[1]


_pearson_block = None


def _get_pearson_block():
    """Module-level jit (not an inline closure) so the AOT executable
    store can key repeat processes to the same stored executable."""
    global _pearson_block
    if _pearson_block is None:
        import jax

        _pearson_block = jax.jit(_pearson_block_impl)
    return _pearson_block


def stream_pearson(counts1, counts2, writer, block_rows: int = 4096,
                   row_standardize: bool = True):
    """Blocked device Pearson streamed straight into ``writer``.

    Standardizes both operands once on device, then emits [block, m2] tiles
    host-side without ever materializing the full [m1, m2] matrix.
    """
    import jax.numpy as jnp

    from seekr_tpu.ops.pearson import _row_standardize
    from seekr_tpu.utils.aot import aot_call

    # self-similarity (the workflow/find_dist background case) reuses the
    # standardized left operand: one standardize pass, one device copy
    same = counts2 is counts1
    c1 = jnp.asarray(counts1, dtype=jnp.float32)
    c2 = c1 if same else jnp.asarray(counts2, dtype=jnp.float32)
    if row_standardize:
        c1 = aot_call(_row_standardize, (c1,))
        c2 = c1 if same else aot_call(_row_standardize, (c2,))

    block = _get_pearson_block()
    m1 = c1.shape[0]
    for start in range(0, m1, block_rows):
        end = min(start + block_rows, m1)
        writer.append(np.asarray(aot_call(block, (c1[start:end], c2))))
