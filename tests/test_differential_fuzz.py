"""Randomized differential fuzz against the live reference implementation.

Each seed generates a quirky-but-valid FASTA corpus (multi-line wrapping,
lowercase soft-masking, N runs, pipe/duplicate headers, very short
sequences) plus a random parameter draw, then asserts stage-for-stage
agreement with the mounted reference package (/root/reference).

Generator stays inside what the reference tolerates (seekr crashes on
blank lines in `_upper_seq_per_line` fasta_reader.py:53 and on sequences
of length exactly k-1 — ZeroDivisionError at kmer_counts.py:144 — so
those inputs are not generated; they are covered by our own error-path
tests instead).

Soak validation (round 2): ~1,900 randomized seeds across all stages
ran against the live reference with ZERO genuine divergences.  The
comparison methodology had to absorb three inherent-instability classes
along the way (chaotic small-sample MLE optima, the stochastic 'mse'
statistic, and bounded-support logpdf boundary flips) — each is
attributed by proving both sides faithful to scipy on their own data
rather than papered over with looser tolerances.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

BASES = "AGTC"


@pytest.fixture(scope="module")
def ref_pkg():
    if os.environ.get("SEEKR_TPU_FORCE_LOCAL_FIXTURES"):
        pytest.skip("bare-clone reproduction (SEEKR_TPU_FORCE_LOCAL_FIXTURES)")
    sys.path.insert(0, REFERENCE)
    try:
        from seekr.kmer_counts import BasicCounter as RefCounter
        from seekr.pearson import pearson as ref_pearson
        from seekr.fasta_reader import Reader as RefReader
    except ImportError:
        pytest.skip("reference package not importable")
    finally:
        sys.path.remove(REFERENCE)
    return RefCounter, ref_pearson, RefReader


def _random_seq(rng, length):
    """Random sequence with lowercase runs and N (invalid) runs."""
    chars = list(rng.choice(list(BASES), size=length))
    # soft-masked (lowercase) run — uppercased by the FASTA readers
    if length > 4 and rng.random() < 0.7:
        a = int(rng.integers(0, length - 2))
        b = int(rng.integers(a + 1, length))
        for i in range(a, b):
            chars[i] = chars[i].lower()
    # N runs (invalid k-mers but still in the length denominator)
    if length > 4 and rng.random() < 0.5:
        a = int(rng.integers(0, length - 1))
        b = min(length, a + int(rng.integers(1, 6)))
        for i in range(a, b):
            chars[i] = "N"
    # an occasional non-ASCII byte: the reference's dict counter skips the
    # window; the encoders must too (ascii errors='replace') rather than
    # raising UnicodeEncodeError
    if length > 6 and rng.random() < 0.2:
        chars[int(rng.integers(0, length))] = "Ñ"
    return "".join(chars)


def _write_fasta(path, rng, n_seqs, k):
    """Write a corpus with wrapped lines and messy headers; return n_seqs."""
    header_pool = [
        ">seq{i}",
        ">ENST0000{i}.1|GENE{i}|OTTHUM|len={i}|lncRNA|",
        ">dup|header",
        ">seq {i} with spaces",
    ]
    lines = []
    for i in range(n_seqs):
        h = header_pool[int(rng.integers(0, len(header_pool)))]
        lines.append(h.replace("{i}", str(i)))
        length = int(rng.integers(1, 240))
        while length == k - 1:  # reference ZeroDivisionError (see docstring)
            length = int(rng.integers(1, 240))
        seq = _random_seq(rng, length)
        wrap = int(rng.integers(10, 80))
        for j in range(0, len(seq), wrap):
            lines.append(seq[j:j + wrap])
    path.write_text("\n".join(lines) + "\n")


@pytest.mark.parametrize("seed", range(8))
def test_counts_fuzz_vs_reference(ref_pkg, tmp_path, seed, capsys):
    from seekr_tpu import BasicCounter

    RefCounter, _, _ = ref_pkg
    rng = np.random.default_rng(seed)
    k = int(rng.integers(2, 6))
    n_seqs = int(rng.integers(2, 14))
    log2 = ["Log2.none", "Log2.pre", "Log2.post"][int(rng.integers(0, 3))]
    mean = bool(rng.integers(0, 2))
    # std needs mean-centering in practice but the reference allows any
    # combination; draw independently
    std = bool(rng.integers(0, 2))

    fa = tmp_path / "fuzz.fa"
    _write_fasta(fa, rng, n_seqs, k)

    ours = BasicCounter(str(fa), k=k, mean=mean, std=std, log2=log2,
                        silent=True)
    ours.get_counts()
    ref = RefCounter(str(fa), k=k, mean=mean, std=std, log2=log2,
                     silent=True)
    ref.get_counts()
    capsys.readouterr()  # swallow NaN-after-standardization warnings

    assert ours.counts.shape == ref.counts.shape
    np.testing.assert_allclose(np.asarray(ours.counts), ref.counts,
                               rtol=1e-4, atol=1e-4, equal_nan=True)
    if mean:
        np.testing.assert_allclose(np.asarray(ours.mean), ref.mean,
                                   rtol=1e-4, atol=1e-4, equal_nan=True)
    if std:
        np.testing.assert_allclose(np.asarray(ours.std), ref.std,
                                   rtol=1e-4, atol=1e-4, equal_nan=True)


@pytest.mark.parametrize("seed", range(8, 12))
def test_norm_vector_roundtrip_fuzz(ref_pkg, tmp_path, seed):
    """mean/std saved as .npy by one corpus, loaded by another — the
    cross-file normalization contract (kmer_counts.py:110-114)."""
    from seekr_tpu import BasicCounter

    RefCounter, _, _ = ref_pkg
    rng = np.random.default_rng(seed)
    k = int(rng.integers(2, 5))
    fa1, fa2 = tmp_path / "bkg.fa", tmp_path / "tgt.fa"
    _write_fasta(fa1, rng, int(rng.integers(3, 10)), k)
    _write_fasta(fa2, rng, int(rng.integers(2, 8)), k)

    bkg = RefCounter(str(fa1), k=k, log2="Log2.none", silent=True)
    bkg.get_counts()
    mean_p, std_p = tmp_path / "m.npy", tmp_path / "s.npy"
    np.save(mean_p, bkg.mean)
    np.save(std_p, np.where(bkg.std == 0, 1.0, bkg.std))

    ours = BasicCounter(str(fa2), k=k, mean=str(mean_p), std=str(std_p),
                        log2="Log2.post", silent=True)
    ours.get_counts()
    ref = RefCounter(str(fa2), k=k, mean=str(mean_p), std=str(std_p),
                     log2="Log2.post", silent=True)
    ref.get_counts()
    np.testing.assert_allclose(np.asarray(ours.counts), ref.counts,
                               rtol=1e-4, atol=1e-4, equal_nan=True)


@pytest.mark.parametrize("seed", range(12, 18))
def test_reader_fuzz_vs_reference(ref_pkg, tmp_path, seed):
    """Reader parity on quirky formatting: seqs, headers, data layout."""
    from seekr_tpu.io.fasta import Reader

    _, _, RefReader = ref_pkg
    rng = np.random.default_rng(seed)
    fa = tmp_path / "r.fa"
    _write_fasta(fa, rng, int(rng.integers(1, 12)), k=2)

    ours, ref = Reader(str(fa)), RefReader(str(fa))
    assert ours.get_seqs() == ref.get_seqs()
    assert ours.get_headers() == ref.get_headers()
    # get_data returns (tuples, headers, seqs) with tuples a zip object
    # (fasta_reader.py:84-88) — materialize before comparing
    o_t, o_h, o_s = ours.get_data()
    r_t, r_h, r_s = ref.get_data()
    assert list(o_t) == list(r_t)
    assert (o_h, o_s) == (r_h, r_s)
    assert list(ours.get_data(tuples_only=True)) == \
        list(ref.get_data(tuples_only=True))


@pytest.mark.parametrize("seed", range(30, 34))
def test_find_pval_fuzz_vs_reference(ref_pkg, tmp_path, seed, capsys):
    """find_pval parity on random corpora/params: fitted branch (random
    best-fit draw) and empirical branch (random null array), labels and
    values (reference per-cell loops, seekr/find_pval.py:126-164)."""
    sys.path.insert(0, REFERENCE)
    try:
        from seekr.find_pval import find_pval as ref_find_pval
    finally:
        sys.path.remove(REFERENCE)
    from seekr_tpu.stats.find_pval import find_pval

    RefCounter = ref_pkg[0]
    rng = np.random.default_rng(seed)
    k = int(rng.integers(2, 5))
    fa1, fa2, bkg = (tmp_path / n for n in ("p1.fa", "p2.fa", "bkg.fa"))
    _write_fasta(fa1, rng, int(rng.integers(2, 8)), k)
    _write_fasta(fa2, rng, int(rng.integers(2, 8)), k)
    _write_fasta(bkg, rng, int(rng.integers(4, 12)), k)
    b = RefCounter(str(bkg), k=k, log2="Log2.none", silent=True)
    b.get_counts()
    mp, sp = tmp_path / "m.npy", tmp_path / "s.npy"
    np.save(mp, b.mean)
    np.save(sp, np.where(b.std == 0, 1.0, b.std))
    log2 = ["Log2.none", "Log2.pre", "Log2.post"][int(rng.integers(0, 3))]
    if rng.random() < 0.5:  # fitted branch
        fitres = [("norm", 0.1, (float(rng.normal()),
                                 float(rng.random()) + 0.1)),
                  ("gamma", 0.2, (float(rng.random()) + 0.5, 0.0,
                                  float(rng.random()) + 0.5))]
        bestfit = int(rng.integers(1, 3))
    else:  # empirical branch
        fitres = rng.normal(size=int(rng.integers(5, 400))).astype(
            [np.float32, np.float64][int(rng.integers(0, 2))])
        bestfit = 1
    ours = find_pval(str(fa1), str(fa2), str(mp), str(sp), k, fitres=fitres,
                     log2=log2, bestfit=bestfit, progress_bar=False)
    theirs = ref_find_pval(str(fa1), str(fa2), str(mp), str(sp), k,
                           fitres=fitres, log2=log2, bestfit=bestfit,
                           progress_bar=False)
    capsys.readouterr()
    assert (ours is None) == (theirs is None)
    if ours is not None:
        assert list(ours.index) == list(theirs.index)
        assert list(ours.columns) == list(theirs.columns)
        np.testing.assert_allclose(ours.to_numpy(), theirs.to_numpy(),
                                   rtol=1e-4, atol=1e-4, equal_nan=True)


def _write_gencode_style(rng, fa_path, gtf_path):
    """GENCODE-shaped fasta + gtf with deliberate mismatches: missing GTF
    lines, non-transcript features, ghost transcripts, shuffled attrs."""
    n = int(rng.integers(2, 15))
    tids, lines = [], []
    seq_pool = ["".join(rng.choice(list(BASES), size=60)) for _ in range(4)]
    for i in range(n):
        tid = f"ENSMUST{i:08d}.{int(rng.integers(1, 4))}"
        tids.append(tid)
        length = int(rng.integers(10, 2000))
        lines.append(f">{tid}|GENE{i}|OTT|OTT|GENE-20{int(rng.integers(1, 4))}"
                     f"|lncRNA|{length}|")
        lines.append(seq_pool[int(rng.integers(0, 4))] if rng.random() < 0.4
                     else "".join(rng.choice(list(BASES), size=60)))
    fa_path.write_text("\n".join(lines) + "\n")
    glines = ["## comment"]
    for i, tid in enumerate(tids):
        if rng.random() < 0.2:
            continue
        feat = "transcript" if rng.random() < 0.8 else "exon"
        attrs = [f'gene_id "G{i}"', f'transcript_id "{tid}"']
        if rng.random() < 0.5:
            attrs.append('tag "Ensembl_canonical"')
        if rng.random() < 0.8:
            attrs.append(
                f'transcript_name "GENE{i}-20{int(rng.integers(1, 4))}"')
        rng.shuffle(attrs)
        glines.append("\t".join(["chr1", "HAVANA", feat, "1", "100", ".",
                                 "+", ".", "; ".join(attrs) + ";"]))
    for j in range(int(rng.integers(0, 4))):
        glines.append("\t".join([
            "chr1", "HAVANA", "transcript", "1", "100", ".", "+", ".",
            f'transcript_id "GHOST{j}"; tag "Ensembl_canonical";']))
    gtf_path.write_text("\n".join(glines) + "\n")


@pytest.mark.parametrize("seed", range(40, 46))
def test_filter_gencode_fuzz_vs_reference(ref_pkg, tmp_path, seed, capsys,
                                          monkeypatch):
    """filter_gencode parity on mismatched fasta/gtf pairs.  The combined
    canonical+isoform case is excluded: there the reference zips a
    per-GTF-line list against a per-fasta-record mask (misaligned lists,
    seekr/filter_gencode.py:171) and we deliberately implement the
    intended filter — documented deviation in PARITY.md and covered by
    tests in test_data_acquisition.py."""
    sys.path.insert(0, REFERENCE)
    try:
        from seekr.filter_gencode import filter_gencode as ref_filter
    finally:
        sys.path.remove(REFERENCE)
    from seekr_tpu.data.filter_gencode import filter_gencode

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(seed)
    fa, gtf = tmp_path / "g.fa", tmp_path / "g.gtf"
    _write_gencode_style(rng, fa, gtf)
    canonical = bool(rng.integers(0, 2))
    isoform = ("0" if canonical
               else ["0", "201", "202", "20[12]"][int(rng.integers(0, 4))])
    len_threshold = int(rng.integers(0, 1500))
    rm_dup = bool(rng.integers(0, 2))
    res_o = filter_gencode(str(fa), gtf_path=str(gtf),
                           len_threshold=len_threshold, canonical=canonical,
                           isoform=isoform, rm_dup=rm_dup,
                           outputname=str(tmp_path / "ours"))
    res_r = ref_filter(str(fa), gtf_path=str(gtf),
                       len_threshold=len_threshold, canonical=canonical,
                       isoform=isoform, rm_dup=rm_dup,
                       outputname=str(tmp_path / "ref"))
    capsys.readouterr()
    assert (res_o is None) == (res_r is None)
    if res_o is not None:
        assert res_o[0] == res_r[0]
        assert res_o[1] == res_r[1]
        assert (tmp_path / "ours.fa").read_text() == \
            (tmp_path / "ref.fa").read_text()


@pytest.mark.parametrize("seed", range(18, 22))
def test_pearson_fuzz_vs_reference(ref_pkg, seed):
    """All-pairs Pearson on random count-like matrices, incl. rows with
    zero variance (NaN parity) and tiny column counts."""
    from seekr_tpu import pearson

    _, ref_pearson, _ = ref_pkg
    rng = np.random.default_rng(seed)
    m1, m2 = int(rng.integers(1, 40)), int(rng.integers(1, 40))
    ncol = 4 ** int(rng.integers(1, 5))
    c1 = rng.gamma(0.3, 50.0, size=(m1, ncol)).astype(np.float32)
    c2 = rng.gamma(0.3, 50.0, size=(m2, ncol)).astype(np.float32)
    # sprinkle constant rows -> zero stddev -> NaN/inf semantics
    if m1 > 2:
        c1[int(rng.integers(0, m1))] = 3.25
    if m2 > 2:
        c2[int(rng.integers(0, m2))] = 0.0

    ours = np.asarray(pearson(c1.copy(), c2.copy()))
    with np.errstate(divide="ignore", invalid="ignore"):
        theirs = ref_pearson(c1.copy(), c2.copy())
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4,
                               equal_nan=True)


@pytest.mark.parametrize("seed", range(46, 51))
def test_find_dist_fuzz_vs_reference(ref_pkg, tmp_path, seed, capsys,
                                     monkeypatch):
    """find_dist parity on random corpora/params: background counts +
    Pearson + triu + (seeded) subsetting + scipy MLE fits + ranking
    (seekr/find_dist.py:82-247).  Both sides write bkg_{mean,std} npy
    side-effect files into CWD; each side's copies are stashed and
    compared.  Subsetting draws from the global legacy np.random stream;
    seeding both sides identically makes the chosen INDICES equal (the
    permutation depends only on the pool length), so values stay
    elementwise comparable."""
    sys.path.insert(0, REFERENCE)
    try:
        from seekr.find_dist import find_dist as ref_find_dist
    finally:
        sys.path.remove(REFERENCE)
    from seekr_tpu.stats.find_dist import find_dist

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(seed)
    k = int(rng.integers(2, 5))
    fa = tmp_path / "bkg.fa"
    _write_fasta_long(fa, rng, int(rng.integers(6, 14)), k)
    log2 = ["Log2.none", "Log2.pre", "Log2.post"][int(rng.integers(0, 3))]
    models = ["common10",
              ["norm", "expon", "gumbel_r", "logistic"],
              ["norm", "lognorm", "nosuchmodel"]][int(rng.integers(0, 3))]
    statsmethod = ["ks", "mse", "aic", "bic"][int(rng.integers(0, 4))]
    fit_model = bool(rng.integers(0, 2))
    subsetting = bool(rng.integers(0, 2))
    subset_size = int(rng.integers(10, 40))
    kwargs = dict(inputseq=str(fa), k_mer=k, log2=log2, models=models,
                  subsetting=subsetting, subset_size=subset_size,
                  fit_model=fit_model, statsmethod=statsmethod,
                  progress_bar=False, plotfit=None, outputname=None)

    np.random.seed(seed)
    res_r = ref_find_dist(**kwargs)
    side_r = [np.load(tmp_path / f"bkg_{w}_{k}mers.npy")
              for w in ("mean", "std")]
    np.random.seed(seed)
    res_o = find_dist(**kwargs)
    side_o = [np.load(tmp_path / f"bkg_{w}_{k}mers.npy")
              for w in ("mean", "std")]
    capsys.readouterr()

    for ours, theirs in zip(side_o, side_r):
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
    def fit_inputs():
        # the exact r-arrays each side fitted (same seeded subset draw);
        # computed lazily — only a CDF mismatch needs the attribution
        nofit = dict(kwargs, fit_model=False)
        np.random.seed(seed)
        arr_r2 = np.asarray(ref_find_dist(**nofit))
        np.random.seed(seed)
        arr_o2 = np.asarray(find_dist(**nofit))
        capsys.readouterr()
        return arr_o2, arr_r2

    if not fit_model:
        np.testing.assert_allclose(np.asarray(res_o), np.asarray(res_r),
                                   rtol=1e-3, atol=1e-4)
        return
    names_o = [t[0] for t in res_o]
    names_r = [t[0] for t in res_r]
    assert set(names_o) == set(names_r)
    stats_r = {t[0]: t[1] for t in res_r}
    params_r = {t[0]: t[2] for t in res_r}
    from scipy import stats as scipy_stats
    grid = np.linspace(-1.0, 1.0, 41)  # r-values live in [-1, 1]
    # 'mse' is a STOCHASTIC statistic (residuals against rvs draws from
    # the global stream); rejection-sampled distributions consume a
    # param-dependent number of variates, so one chaotic fit upstream
    # desynchronizes every later model's synthetic sample — cross-side
    # stat equality is unsound for mse (soak seeds 20022/20046).  The
    # deterministic methods (ks/aic/bic) compare exactly; mse runs keep
    # the name-set and fitted-CDF checks only.
    compare_stats = statsmethod != "mse"
    unstable = set()
    for name, stat, params in res_o:
        # raw MLE params can be ill-conditioned (e.g. lognorm with shape
        # ~1e-3 trades loc against scale); compare the fitted
        # DISTRIBUTIONS via their CDFs over the r-value range instead
        dist = getattr(scipy_stats, name)
        cdf_o = dist.cdf(grid, *params)
        cdf_r = dist.cdf(grid, *params_r[name])
        if np.allclose(cdf_o, cdf_r, atol=5e-3):
            if not (np.isfinite(stat) and np.isfinite(stats_r[name])):
                # bounded-support aic/bic chaos: a data point exactly at
                # the fitted support edge makes logpdf -inf, and one ULP
                # of input difference flips which side hits it (soak
                # seeds 40029/40039/40057, uniform) — both sides remain
                # faithful scipy on their own data
                unstable.add(name)
                continue
            if compare_stats and not np.isclose(
                    stat, stats_r[name], rtol=5e-2, atol=1e-6):
                # amplification beyond tolerance (logpdf can swing
                # unboundedly near support boundaries — soak seed 50044,
                # chi2 aic at 5.4%): discriminate parity bug from data
                # epsilon by requiring each side to reproduce ITS OWN
                # stat from scipy directly
                def direct(data, prms):
                    with np.errstate(all="ignore"):
                        if statsmethod == "ks":
                            from scipy.stats import kstest
                            return kstest(data, name, args=prms).statistic
                        ll = np.sum(dist.logpdf(data, *prms))
                        npar, nn = len(prms), len(data)
                        return (2 * npar - 2 * ll if statsmethod == "aic"
                                else np.log(nn) * npar - 2 * ll)
                arr_o, arr_r = fit_inputs()
                assert np.isclose(stat, direct(arr_o, params),
                                  rtol=1e-6, atol=1e-9),                     f"{name}: our {statsmethod} not reproducible"
                assert np.isclose(stats_r[name],
                                  direct(arr_r, params_r[name]),
                                  rtol=1e-6, atol=1e-9),                     f"{name}: reference {statsmethod} not reproducible"
                unstable.add(name)
            continue
        # the two sides found DIFFERENT optima.  The pipelines feed the
        # optimizer epsilon-different r-values (device f32 vs numpy f32),
        # and some MLEs are chaotic on small samples (soak seed 10024:
        # exponpow shape 0.73 vs 0.59 from inputs equal to 5e-6).  That
        # is fit sensitivity, not an implementation divergence — PROVE it
        # by re-running scipy's own fit on each side's r-array and
        # requiring each pipeline to be faithful to scipy on its own data
        arr_o, arr_r = fit_inputs()
        with np.errstate(all="ignore"):
            direct_o = dist.fit(arr_o)
            direct_r = dist.fit(arr_r)
        np.testing.assert_allclose(
            dist.cdf(grid, *params), dist.cdf(grid, *direct_o), atol=5e-3,
            err_msg=f"{name}: our fit unfaithful to scipy on our data")
        np.testing.assert_allclose(
            dist.cdf(grid, *params_r[name]), dist.cdf(grid, *direct_r),
            atol=5e-3,
            err_msg=f"{name}: reference fit not reproducible on its data")
        unstable.add(name)
    # ranking agrees wherever adjacent stats are separated by MORE than
    # the stat-comparison tolerance (stats agreeing only to ~2% cannot
    # support finer ordering claims — soak seed 20022 packed four fits
    # within 1%) and both fits converged to the same optimum
    # (deterministic stats only)
    if not compare_stats:
        return
    for i in range(len(names_o) - 1):
        a, b = names_o[i], names_o[i + 1]
        if a in unstable or b in unstable:
            continue
        if abs(stats_r[a] - stats_r[b]) > 5e-2 * max(
                abs(stats_r[a]), abs(stats_r[b]), 1e-12):
            assert names_r.index(a) < names_r.index(b), (a, b)


def _write_fasta_long(path, rng, n_seqs, k):
    """Like _write_fasta but with >=50-base sequences so scipy MLE fits
    see enough r-values to behave (tiny corpora make fits degenerate and
    tolerance comparison meaningless)."""
    lines = []
    for i in range(n_seqs):
        lines.append(f">seq{i}")
        length = int(rng.integers(50, 400))
        seq = "".join(rng.choice(list(BASES), size=length))
        lines.append(seq)
    path.write_text("\n".join(lines) + "\n")


@pytest.mark.parametrize("k", [7, 8])
def test_counts_large_k_vs_reference(ref_pkg, tmp_path, k, capsys):
    """k=7/k=8 column order and values against the live reference — the
    Pallas kernel's asymmetric bit splits (128x128, 512x128) must still
    flatten to the reference's itertools.product('AGTC') order."""
    from seekr_tpu import BasicCounter

    RefCounter, _, _ = ref_pkg
    rng = np.random.default_rng(k)
    fa = tmp_path / "bigk.fa"
    _write_fasta(fa, rng, 6, k)

    ours = BasicCounter(str(fa), k=k, mean=False, std=False,
                        log2="Log2.none", silent=True)
    ours.get_counts()
    ref = RefCounter(str(fa), k=k, mean=False, std=False,
                     log2="Log2.none", silent=True)
    ref.get_counts()
    capsys.readouterr()
    assert ours.counts.shape == ref.counts.shape == (6, 4 ** k)
    np.testing.assert_allclose(np.asarray(ours.counts), ref.counts,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", range(60, 64))
def test_build_url_fuzz_vs_reference(ref_pkg, seed):
    """Downloader.build_url parity across biotype/species/gtf/release
    draws (pure URL construction — testable without network; the
    scrape/download halves need egress and are covered by unit tests)."""
    sys.path.insert(0, REFERENCE)
    try:
        from seekr.fasta import Downloader as RefDownloader
    finally:
        sys.path.remove(REFERENCE)
    from seekr_tpu.data.gencode import Downloader

    rng = np.random.default_rng(seed)
    biotypes = ["all", "pc", "lncRNA", "bogus"]
    species_pool = ["human", "mouse", "dog"]
    for _ in range(12):
        biotype = biotypes[int(rng.integers(0, len(biotypes)))]
        species = species_pool[int(rng.integers(0, len(species_pool)))]
        gtf = bool(rng.integers(0, 2))
        if species == "mouse":
            release = ["M5", "M25", "M31", "5"][int(rng.integers(0, 4))]
        else:
            release = ["22", "43", "19", "M5"][int(rng.integers(0, 4))]
        try:
            expected = RefDownloader().build_url(biotype, species, gtf,
                                                 release)
            raised = None
        except AssertionError as e:
            expected, raised = None, str(e)
        if raised is None:
            got = Downloader().build_url(biotype, species, gtf, release)
            assert got == expected, (biotype, species, gtf, release)
        else:
            with pytest.raises(AssertionError):
                Downloader().build_url(biotype, species, gtf, release)
