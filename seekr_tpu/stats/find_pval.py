"""P-values for pairwise k-mer Pearson similarities.

Behavioral parity with seekr/find_pval.py:70-183: counts + Pearson of two
fastas, then per-cell p-values from either a fitted scipy distribution
(``1 - cdf(r)``) or an empirical background sample (``mean(bkg > r)``).

TPU-native changes:
  * counting + Pearson run on device (KmerCounter / pearson).
  * the empirical branch is a sorted ``searchsorted`` (O(log N) per cell,
    float64) instead of the reference's O(N) Python loop per cell
    (seekr/find_pval.py:157-164) — identical values including tie handling.
  * the fitted branch evaluates the vectorized scipy cdf over the whole
    matrix at once instead of a nested element loop
    (seekr/find_pval.py:130-133) — identical math.
  * the k vs mean/std compatibility check implements the reference's
    *intended* logic; upstream line find_pval.py:76 has an operator-
    precedence bug (`!=` binds tighter than `|`, turning the check into a
    chained comparison) that makes it pass vacuously.
"""

from __future__ import annotations

import os

import numpy as np

from seekr_tpu.models.counter import KmerCounter
from seekr_tpu.models.pearson import pearson
from seekr_tpu.ops.ecdf import empirical_pvals


def is_float_type(x):
    """Numeric check for fitres entries.

    Deliberate fix of the reference's version (seekr/find_pval.py:56-57:
    ``isinstance(x, float) or np.isscalar(x)``): np.isscalar('x') is True,
    so upstream validation accepts strings and then crashes inside
    scipy.stats instead of returning None with the advisory message — this
    implements the check the validation exists for.
    """
    return isinstance(x, (int, float, np.floating, np.integer))


def check_tuple_format(tup):
    """(distribution name, deviance, parameters) — seekr/find_pval.py:58-64."""
    if len(tup) != 3:
        return False
    return (isinstance(tup[0], str)
            and is_float_type(tup[1])
            and isinstance(tup[2], tuple)
            and all(is_float_type(x) for x in tup[2]))


def check_main_list(main_list):
    return all(check_tuple_format(tup) for tup in main_list)


def find_pval(seq1file, seq2file, mean_path, std_path, k_mer, fitres,
              log2="Log2.post", bestfit=1, outputname=None, progress_bar=True,
              stream=None, npy_out=None, stream_block_rows: int = 4096,
              data_parallel=None):
    """p-value DataFrame (rows = seq1 headers, cols = seq2 headers).

    Same signature/return contract as seekr/find_pval.py:70 (None on invalid
    ``fitres`` format, with the same advisory messages).

    ``progress_bar`` is accepted for signature parity but has no effect:
    the reference ticks a bar once per matrix cell
    (seekr/find_pval.py:130,161) because it computes p-values in a Python
    loop; here the whole matrix is one vectorized cdf/searchsorted call, so
    there is nothing incremental to report.

    Extreme-scale extension (the reference materializes the full [m1, m2]
    DataFrame on host, seekr/find_pval.py:126-140 — ~130 GB float32 at the
    180k GENCODE extreme): when the output exceeds
    ``io.stream.STREAM_CELL_THRESHOLD`` cells and an output path is given,
    the matrix is STREAMED — device Pearson tiles -> vectorized cdf /
    searchsorted per tile -> CSV/npy appends — and the function returns
    None after printing where the artifacts went; the [m1, m2] matrix never
    exists on host or device.  ``stream`` forces the mode on/off (None =
    auto), ``npy_out`` additionally writes the float32 matrix as a .npy
    artifact (the input ``adj_pval_stream`` corrects at the same scale),
    ``stream_block_rows`` is the device tile height.  Streamed CSV bytes
    are identical to the in-memory path's (pinned by
    tests/test_stream_pval.py).

    ``data_parallel`` (CLI ``-dp``, like find_dist's) runs the O(m1*m2)
    Pearson data-sharded over an N-device mesh
    (parallel.dist.stream_pearson_sharded): the standardized right
    matrix stays sharded, each left row block all-gathers over the ICI,
    every device computes its column slice of the tile.  Same values
    within GEMM-retiling ulp; combines with streaming.
    """
    meanfile = np.load(mean_path)
    stdfile = np.load(std_path)
    if len(meanfile) != 4 ** k_mer or len(stdfile) != 4 ** k_mer:
        print("k_mer size is not compatible with the normalization mean "
              "and/or std files.")
        print("Please make sure the normalization mean and std files are "
              "generated using the same kmer size as specified here in k_mer.")
        print("No p value is calculated. The output is None.")
        return None

    t1 = KmerCounter(seq1file, mean=mean_path, std=std_path, k=k_mer,
                     log2=log2, silent=True)
    # self-comparison (the background-vs-itself workflow): one counter,
    # one count pass, and — crucially — ONE array object, so the
    # downstream self-similarity logic (single standardize, upper-triangle
    # mirror in models.pearson) engages and the p-value matrix is exactly
    # symmetric, taking adj_pval's triu path like the reference's
    # bitwise-symmetric np.inner output does (its (i,j) and (j,i) are the
    # same row-dot-row; our blocked GEMM computes them in different-shaped
    # tiles whose ~1e-5 retiling differences can flip the 5-dp detector)
    same_file = os.path.realpath(seq1file) == os.path.realpath(seq2file)
    t2 = t1 if same_file else KmerCounter(seq2file, mean=mean_path,
                                          std=std_path, k=k_mer,
                                          log2=log2, silent=True)
    # device-resident counts: the reference calls make_count_file (with no
    # outfile, so no artifact is written — seekr/kmer_counts.py:243-262);
    # here the [m, 4^k] matrices stay on device and feed Pearson directly,
    # so only the [m1, m2] similarity matrix (or, streamed, one tile of it
    # at a time) ever crosses to the host
    c1 = t1.get_counts_device()
    c2 = c1 if same_file else t2.get_counts_device()
    if c2 is not c1 and c1.shape == c2.shape:
        # identical-content files under different names (copies,
        # hardlinks the realpath check missed) are the same comparison:
        # the reference's np.inner would produce a bitwise-symmetric
        # matrix for them, so detect equality ON DEVICE (one compiled
        # reduce; only a bool crosses the wire) and collapse to the
        # self path.  Labels (header2) are kept as parsed — adj_pval's
        # detector compares them too, exactly like the reference.
        import jax.numpy as jnp

        try:
            if bool(jnp.array_equal(c1, c2, equal_nan=True)):
                c2 = c1
        except TypeError:  # older jax without equal_nan
            if bool(jnp.array_equal(c1, c2)):
                c2 = c1

    # counters already read and parsed both fastas; re-Reader-ing them
    # would re-parse multi-hundred-MB files at background scale
    header1 = [h[1:] for h in t1.headers]
    header2 = [h[1:] for h in t2.headers]
    if len(header1) != len(set(header1)):
        print("The headers of seq1file is not unique.")
        print("Be carefule during further analysis as there are potential "
              "indexing problems.")
    if len(header2) != len(set(header2)):
        print("The headers of seq2file is not unique.")
        print("Be carefule during further analysis as there are potential "
              "indexing problems.")

    if isinstance(fitres, list):
        if not check_main_list(fitres):
            print("The format of fitres is wrong.")
            print("fitres should be a list consisting of tuples (string, "
                  "number, tuple of numbers) corresponds to (distribution "
                  "name, deviance, parameters)")
            print("fitres should be the output of find_dist.")
            print("No p value is calculated. The output is None.")
            return None
        try:
            if float(bestfit) != int(bestfit):  # 1.5 must not truncate
                raise ValueError
            bestfit = int(bestfit)
        except (TypeError, ValueError):
            print(f"bestfit must be an integer between 1 and the number "
                  f"of fitted distributions in fitres ({len(fitres)}), "
                  f"got {bestfit!r}.")
            print("No p value is calculated. The output is None.")
            return None
        if not 1 <= bestfit <= len(fitres):
            # deliberate hardening over the reference, which indexes
            # fitres[bestfit-1] unchecked: an empty/short list raises
            # IndexError and bestfit=0 silently selects fitres[-1] — the
            # WORST-fitting distribution (documented in PARITY.md)
            print(f"bestfit must be between 1 and the number of fitted "
                  f"distributions in fitres ({len(fitres)}), got {bestfit}.")
            print("No p value is calculated. The output is None.")
            return None
        distname, _, params = fitres[bestfit - 1]

        def pval_fn(sim):
            # bitwise-identical fast path for the common10 distributions:
            # rv_continuous.cdf's wrapper machinery costs 7-126 s on a
            # GENCODE-scale matrix; stats.fast_cdf runs the same
            # arithmetic through threaded scipy.special ufuncs
            # (None -> scipy fallback)
            from seekr_tpu.stats.fast_cdf import fast_cdf

            cdf_vals = fast_cdf(distname, params, sim)
            if cdf_vals is None:
                from scipy import stats

                cdf_vals = getattr(stats, distname)(*params).cdf(sim)
            # float32 like the reference's np.zeros_like(sim) accumulator
            return (1.0 - cdf_vals).astype(sim.dtype)
    elif isinstance(fitres, np.ndarray):
        if fitres.ndim != 1:
            print("The dimension of fitres as a numpy array is wrong. fitres "
                  "should be a 1D numpy array.")
            print("fitres should be the output of find_dist.")
            print("No p value is calculated. The output is None.")
            return None

        from seekr_tpu.ops.ecdf import SortedBackground

        # sort ONCE: the streamed mode calls pval_fn per tile, and the
        # background (possibly millions of r-values) never changes
        sorted_bkg = SortedBackground(fitres)

        def pval_fn(sim):
            return np.asarray(sorted_bkg.pvals(sim), dtype=sim.dtype)
    else:
        print("fitres should be the output of find_dist. It should be "
              "either a list of distributions or a numpy array.")
        print("No p value is calculated. The output is None.")
        return None

    m1, m2 = len(header1), len(header2)
    from seekr_tpu.io.stream import STREAM_CELL_THRESHOLD
    from seekr_tpu.parallel.mesh import build_mesh_from_flags

    mesh = build_mesh_from_flags(data_parallel)
    do_stream = (stream if stream is not None
                 else (m1 * m2 > STREAM_CELL_THRESHOLD
                       and bool(outputname or npy_out)))
    if do_stream and not (outputname or npy_out):
        # a forced stream with no sink would run the whole tile-wise
        # computation and silently discard every value
        raise ValueError("find_pval(stream=True) writes artifacts only: "
                         "pass outputname= (csv) and/or npy_out= (.npy)")
    if do_stream:
        return _stream_pvals(c1, c2, pval_fn, header1, header2,
                             outputname, npy_out, stream_block_rows, mesh)

    if mesh is not None:
        from seekr_tpu.io.stream import ArrayCollector
        from seekr_tpu.models.pearson import mirror_upper_inplace
        from seekr_tpu.parallel.dist import stream_pearson_sharded

        coll = ArrayCollector()
        # counts2=None on self: one standardize pass, one device copy
        stream_pearson_sharded(mesh, c1, coll,
                               counts2=None if c2 is c1 else c2,
                               block_rows=stream_block_rows)
        sim = coll.result()
        if c2 is c1:
            # exact symmetry like the non-mesh path (models.pearson)
            mirror_upper_inplace(sim)
    else:
        sim = pearson(c1, c2)
    p_values = pval_fn(sim)
    if npy_out:
        np.save(npy_out, p_values)
    return _emit(p_values, header1, header2, outputname)


def _stream_pvals(c1, c2, pval_fn, header1, header2, outputname, npy_out,
                  block_rows, mesh=None):
    """Tile-wise sim -> cdf -> append: the [m1, m2] matrix never exists.

    Peak host memory is ONE [block_rows, m2] tile (the device holds the
    two standardized count matrices plus a tile); output bytes are
    identical to the in-memory path's CSV / .npy artifacts (pinned by
    tests/test_stream_pval.py).  Beats seekr/find_pval.py:126-140, which
    builds the complete [m1, m2] DataFrame on host (~130 GB float32 at
    the 180k GENCODE extreme).
    """
    from seekr_tpu.io.stream import (StreamingCsvWriter, StreamingNpyWriter,
                                     stream_pearson)

    m1, m2 = len(header1), len(header2)
    sinks = []

    class _PvalTiles:
        def append(self, sim_block):
            p = pval_fn(np.asarray(sim_block))
            for s in sinks:
                s.append(p)

    # sink construction, streaming, AND the close loop all sit inside one
    # discard-on-error envelope: a failure constructing the second sink
    # (or closing one sink) must not leak the other's .part, and no
    # partial artifact may ever publish (crash-consistency contract);
    # discard() is a safe no-op on sinks that already closed
    try:
        if outputname:
            sinks.append(StreamingCsvWriter(f"{outputname}.csv",
                                            columns=header2,
                                            row_labels=header1, fmt="%s"))
        if npy_out:
            sinks.append(StreamingNpyWriter(npy_out, (m1, m2), np.float32))
        if mesh is not None:
            from seekr_tpu.parallel.dist import stream_pearson_sharded

            stream_pearson_sharded(mesh, c1, _PvalTiles(), counts2=c2,
                                   block_rows=block_rows)
        else:
            stream_pearson(c1, c2, _PvalTiles(), block_rows=block_rows)
        paths = []
        for s in sinks:
            s.close()
            paths.append(s.path)
    except BaseException:
        for s in sinks:
            s.discard()
        raise
    print(f"p values streamed: {m1} x {m2} matrix written to "
          f"{' and '.join(paths)}.")
    print("The output is None (streamed mode does not materialize the "
          "matrix; load the artifacts instead).")
    return None


def _emit(p_values, header1, header2, outputname):
    import pandas as pd

    pval_df = pd.DataFrame(p_values, index=header1, columns=header2)
    if outputname:
        pval_df.to_csv(f"{outputname}.csv")
    return pval_df
