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
              log2="Log2.post", bestfit=1, outputname=None, progress_bar=True):
    """p-value DataFrame (rows = seq1 headers, cols = seq2 headers).

    Same signature/return contract as seekr/find_pval.py:70 (None on invalid
    ``fitres`` format, with the same advisory messages).

    ``progress_bar`` is accepted for signature parity but has no effect:
    the reference ticks a bar once per matrix cell
    (seekr/find_pval.py:130,161) because it computes p-values in a Python
    loop; here the whole matrix is one vectorized cdf/searchsorted call, so
    there is nothing incremental to report.
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
    t2 = KmerCounter(seq2file, mean=mean_path, std=std_path, k=k_mer,
                     log2=log2, silent=True)
    # device-resident counts: the reference calls make_count_file (with no
    # outfile, so no artifact is written — seekr/kmer_counts.py:243-262);
    # here the [m, 4^k] matrices stay on device and feed Pearson directly,
    # so only the [m1, m2] similarity matrix ever crosses to the host
    c1 = t1.get_counts_device()
    c2 = t2.get_counts_device()
    sim = pearson(c1, c2)

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
        if not 1 <= int(bestfit) <= len(fitres):
            # deliberate hardening over the reference, which indexes
            # fitres[bestfit-1] unchecked: an empty/short list raises
            # IndexError and bestfit=0 silently selects fitres[-1] — the
            # WORST-fitting distribution (documented in PARITY.md)
            print(f"bestfit must be between 1 and the number of fitted "
                  f"distributions in fitres ({len(fitres)}), got {bestfit}.")
            print("No p value is calculated. The output is None.")
            return None
        distname, _, params = fitres[bestfit - 1]
        # bitwise-identical fast path for the common10 distributions:
        # rv_continuous.cdf's wrapper machinery costs 7-126 s on a
        # GENCODE-scale matrix; stats.fast_cdf runs the same arithmetic
        # through threaded scipy.special ufuncs (None -> scipy fallback)
        from seekr_tpu.stats.fast_cdf import fast_cdf

        cdf_vals = fast_cdf(distname, params, sim)
        if cdf_vals is None:
            from scipy import stats

            distribution = getattr(stats, distname)(*params)
            cdf_vals = distribution.cdf(sim)
        # float32 like the reference's np.zeros_like(sim) accumulator
        p_values = (1.0 - cdf_vals).astype(sim.dtype)
        return _emit(p_values, header1, header2, outputname)

    if isinstance(fitres, np.ndarray):
        if fitres.ndim != 1:
            print("The dimension of fitres as a numpy array is wrong. fitres "
                  "should be a 1D numpy array.")
            print("fitres should be the output of find_dist.")
            print("No p value is calculated. The output is None.")
            return None
        p_values = np.asarray(empirical_pvals(fitres, sim), dtype=sim.dtype)
        return _emit(p_values, header1, header2, outputname)

    print("fitres should be the output of find_dist. It should be either a "
          "list of distributions or a numpy array.")
    print("No p value is calculated. The output is None.")
    return None


def _emit(p_values, header1, header2, outputname):
    import pandas as pd

    pval_df = pd.DataFrame(p_values, index=header1, columns=header2)
    if outputname:
        pval_df.to_csv(f"{outputname}.csv")
    return pval_df
