"""Tests for the native C++ layer: Leiden clustering + FASTA reader/encoder."""

import itertools

import numpy as np
import pytest

from seekr_tpu import native
from seekr_tpu.io.encode import encode_fasta, encode_seq, encode_seqs
from seekr_tpu.io.fasta import Reader

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native toolchain unavailable")

ALGOS = list(native.ALGORITHMS)


def clique_pair_edges(size=5, bridge=0.01):
    """Two cliques of ``size`` joined by one weak edge."""
    edges = []
    for base in (0, size):
        for i, j in itertools.combinations(range(base, base + size), 2):
            edges.append((i, j, 1.0))
    edges.append((0, size, bridge))
    src, dst, w = map(np.asarray, zip(*edges))
    return src, dst, w.astype(np.float64), 2 * size


@pytest.mark.parametrize("algo", ALGOS)
def test_leiden_two_cliques(algo):
    src, dst, w, n = clique_pair_edges()
    rs = 0.5 if algo == "CPMVertexPartition" else 1.0
    m = native.leiden(src, dst, w, n, algo=algo, resolution=rs, seed=1)
    assert m.shape == (n,)
    # each clique in one community, the two cliques separated
    assert len(set(m[:5])) == 1
    assert len(set(m[5:])) == 1
    assert m[0] != m[5]


def test_leiden_seed_deterministic():
    src, dst, w, n = clique_pair_edges()
    a = native.leiden(src, dst, w, n, algo="RBERVertexPartition", seed=7)
    b = native.leiden(src, dst, w, n, algo="RBERVertexPartition", seed=7)
    np.testing.assert_array_equal(a, b)


def test_leiden_ring_of_cliques():
    # 8 cliques of 6 nodes in a ring — classic Leiden/Louvain testbed
    k, nc = 6, 8
    edges = []
    for c in range(nc):
        base = c * k
        for i, j in itertools.combinations(range(base, base + k), 2):
            edges.append((i, j, 1.0))
        edges.append((base + k - 1, ((c + 1) % nc) * k, 0.5))
    src, dst, w = map(np.asarray, zip(*edges))
    m = native.leiden(src, dst, w.astype(np.float64), nc * k,
                      algo="ModularityVertexPartition", seed=3)
    # every clique intact
    for c in range(nc):
        assert len(set(m[c * k:(c + 1) * k])) == 1
    assert len(set(m.tolist())) >= 4


def test_leiden_resolution_monotone():
    src, dst, w, n = clique_pair_edges(size=4, bridge=0.9)
    lo = native.leiden(src, dst, w, n, algo="CPMVertexPartition",
                       resolution=0.05, seed=1)
    hi = native.leiden(src, dst, w, n, algo="CPMVertexPartition",
                       resolution=5.0, seed=1)
    assert len(set(lo.tolist())) <= len(set(hi.tolist()))


def test_leiden_unweighted_and_errors():
    src, dst, w, n = clique_pair_edges()
    m = native.leiden(src, dst, None, n, algo="modularity", seed=1)
    assert m.shape == (n,)
    with pytest.raises(ValueError):
        native.leiden(src, dst, w, n, algo="not_an_algo")
    with pytest.raises(ValueError):
        native.leiden(src, dst[:-1], w, n)


def test_native_fasta_matches_python_reader(ref_data):
    for name in ("example.fa", "example2.fa", "v22_pc_head.fa"):
        path = str(ref_data / name)
        with native.NativeFasta(path) as nf:
            py = Reader.__new__(Reader)
            py.infasta, py.outfasta, py.names, py.data = path, None, None, None
            py._read_data()
            py._upper_seq_per_line()
            assert nf.headers() == py.data[::2]
            assert nf.seqs() == py.data[1::2]


def test_native_encode_matches_python(ref_data):
    path = str(ref_data / "example.fa")
    with native.NativeFasta(path) as nf:
        for i in range(len(nf)):
            seq = nf.seq(i)
            np.testing.assert_array_equal(
                nf.encode_batch([i], len(seq))[0], encode_seq(seq))
    # lowercase is INVALID like the reference's uppercase-keyed k-mer map
    np.testing.assert_array_equal(native.encode_string("AGTCNagtcn"),
                                  [0, 1, 2, 3, 4, 4, 4, 4, 4, 4])


def test_encode_fasta_native_equals_python(ref_data):
    path = str(ref_data / "example.fa")
    seqs = Reader(path).get_seqs()
    enc_py = encode_seqs(seqs, k=2)
    enc_nat = encode_fasta(path, k=2)
    assert enc_nat.n_seqs == enc_py.n_seqs
    np.testing.assert_array_equal(enc_nat.lengths, enc_py.lengths)
    assert len(enc_nat.buckets) == len(enc_py.buckets)
    for (b1, l1, r1), (b2, l2, r2) in zip(enc_nat.buckets, enc_py.buckets):
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(r1, r2)


def test_reader_uses_native_transparently(ref_data, tmp_path):
    # multi-line + lower-case + blank lines exercise the join/upper path
    messy = tmp_path / "messy.fa"
    messy.write_text(">h1|x\nacgT\nGGca\n\n>h2\ntttt\n")
    r = Reader(str(messy))
    assert r.get_seqs() == ["ACGTGGCA", "TTTT"]
    assert r.get_headers() == [">h1|x", ">h2"]


def test_native_fasta_edge_cases(tmp_path):
    # CRLF line endings, no trailing newline, stray blank lines and tabs
    messy = tmp_path / "edge.fa"
    messy.write_bytes(b">h1\r\nAC\r\nGT\r\n\r\n>h2|x\n\ttt \naa")
    with native.NativeFasta(str(messy)) as nf:
        assert nf.headers() == [">h1", ">h2|x"]
        assert nf.seqs() == ["ACGT", "TTAA"]
    # python Reader agrees (strip + join + upper semantics)
    r = Reader(str(messy))
    assert r.get_seqs() == ["ACGT", "TTAA"]


def test_native_fasta_empty_and_missing(tmp_path):
    empty = tmp_path / "empty.fa"
    empty.write_text("")
    with native.NativeFasta(str(empty)) as nf:
        assert len(nf) == 0
    with pytest.raises(IOError):
        native.NativeFasta(str(tmp_path / "nope.fa"))


def test_native_encode_batch_truncates_long_rows(ref_data):
    path = str(ref_data / "example.fa")
    with native.NativeFasta(path) as nf:
        lpad = 4
        enc = nf.encode_batch(list(range(len(nf))), lpad)
        assert enc.shape == (len(nf), lpad)
        for i in range(len(nf)):
            seq = nf.seq(i)[:lpad]
            np.testing.assert_array_equal(enc[i, :len(seq)],
                                          encode_seq(seq))


def test_native_count_kmers_matches_oracle(ref_data):
    from seekr_tpu.ops.count import count_kmers_host

    for name in ("example.fa", "example2.fa"):
        path = str(ref_data / name)
        with native.NativeFasta(path) as nf:
            for k in (1, 2, 3, 6):
                got = nf.count_kmers(k)
                oracle = count_kmers_host(nf.seqs(), k)
                np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-4)


def test_native_count_kmers_invalid_bases(tmp_path):
    from seekr_tpu.ops.count import count_kmers_host

    fa = tmp_path / "n.fa"
    fa.write_text(">a\nAGTCNNAGTCNAG\n>b\nAG\n")
    with native.NativeFasta(str(fa)) as nf:
        got = nf.count_kmers(3)
        oracle = count_kmers_host(nf.seqs(), 3)
        np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-4)
    assert (got[1] == 0).all()  # shorter than k -> zero row


def test_leiden_modularity_competitive_with_louvain():
    """On SBM graphs our Leiden engine should reach modularity at least on
    par with networkx's Louvain (both optimize the same objective)."""
    import networkx as nx

    rng = np.random.default_rng(42)
    sizes = [30, 25, 20, 25]
    p_in, p_out = 0.35, 0.02
    G = nx.stochastic_block_model(sizes, [[p_in if i == j else p_out
                                           for j in range(4)]
                                          for i in range(4)], seed=7)
    edges = np.array(G.edges())
    m = native.leiden(edges[:, 0], edges[:, 1], None, G.number_of_nodes(),
                      algo="ModularityVertexPartition", seed=5)
    ours = [set(np.nonzero(m == c)[0].tolist())
            for c in range(m.max() + 1)]
    q_ours = nx.community.modularity(G, ours)

    louvain = nx.community.louvain_communities(G, seed=5)
    q_louvain = nx.community.modularity(G, louvain)
    assert q_ours >= q_louvain - 0.02, (q_ours, q_louvain)
    # and the planted blocks are essentially recovered
    assert 3 <= len(ours) <= 6


def test_leiden_edge_cases():
    # single node, no edges
    m = native.leiden(np.array([], np.int64), np.array([], np.int64), None, 1,
                      algo="modularity", seed=1)
    np.testing.assert_array_equal(m, [0])
    # all isolated nodes
    m = native.leiden(np.array([], np.int64), np.array([], np.int64), None, 5,
                      algo="modularity", seed=1)
    assert len(set(m.tolist())) == 5  # each its own community
    # self-loops only
    m = native.leiden(np.array([0, 1]), np.array([0, 1]),
                      np.array([2.0, 3.0]), 3, algo="modularity", seed=1)
    assert m.shape == (3,)
    # disconnected pair of edges
    m = native.leiden(np.array([0, 2]), np.array([1, 3]), None, 4,
                      algo="modularity", seed=1)
    assert m[0] == m[1] and m[2] == m[3] and m[0] != m[2]
    # star graph stays one community under modularity
    n = 8
    m = native.leiden(np.zeros(n - 1, np.int64), np.arange(1, n), None, n,
                      algo="modularity", seed=1)
    assert len(set(m.tolist())) == 1


def test_leiden_fuzz_random_graphs():
    """Random graphs: membership is always a valid compact labeling and
    deterministic under a fixed seed, for every quality function."""
    rng = np.random.default_rng(0)
    for trial in range(8):
        n = int(rng.integers(2, 60))
        n_edges = int(rng.integers(0, n * 3))
        src = rng.integers(0, n, n_edges)
        dst = rng.integers(0, n, n_edges)
        w = rng.uniform(0.1, 2.0, n_edges)
        algo = str(rng.choice(ALGOS))
        m1 = native.leiden(src, dst, w, n, algo=algo, seed=trial)
        m2 = native.leiden(src, dst, w, n, algo=algo, seed=trial)
        np.testing.assert_array_equal(m1, m2)
        assert m1.min() == 0
        labels = set(m1.tolist())
        assert labels == set(range(len(labels)))  # compact ids


def test_leiden_modularity_never_negative_vs_singletons():
    """Modularity of the found partition >= modularity of all-singletons
    (which the algorithm starts from) on weighted random graphs."""
    import networkx as nx

    rng = np.random.default_rng(3)
    for trial in range(4):
        G = nx.gnp_random_graph(40, 0.12, seed=trial)
        if G.number_of_edges() == 0:
            continue
        edges = np.array(G.edges())
        m = native.leiden(edges[:, 0], edges[:, 1], None, 40,
                          algo="ModularityVertexPartition", seed=trial)
        parts = [set(np.nonzero(m == c)[0].tolist())
                 for c in range(m.max() + 1)]
        q = nx.community.modularity(G, parts)
        q_singletons = nx.community.modularity(G, [{v} for v in G.nodes()])
        assert q >= q_singletons - 1e-12


def test_native_fasta_use_after_close_raises(ref_data):
    nf = native.NativeFasta(str(ref_data / "example.fa"))
    nf.close()
    with pytest.raises(ValueError):
        len(nf)
    with pytest.raises(ValueError):
        nf.seq(0)
    with pytest.raises(ValueError):
        nf.count_kmers(2)


def test_significance_runs_unweighted(ref_data, tmp_path):
    """Significance memberships must not depend on edge weights."""
    import pandas as pd
    from seekr_tpu.graph.kmer_leiden import leiden_membership

    rng = np.random.default_rng(0)
    x = rng.normal(size=(12, 20))
    sim = np.corrcoef(x)
    sim[sim < 0] = 0
    np.fill_diagonal(sim, 0)
    names = [f"s{i}" for i in range(12)]
    df = pd.DataFrame(sim, index=names, columns=names)
    m1 = leiden_membership(df, algo="SignificanceVertexPartition",
                           setseed=True)
    df2 = df * 7.5  # weight scaling must not change the result
    m2 = leiden_membership(df2, algo="SignificanceVertexPartition",
                           setseed=True)
    np.testing.assert_array_equal(m1, m2)


def test_leiden_negative_seed_rejected():
    if not native.native_available():
        pytest.skip("native unavailable")
    with pytest.raises(ValueError, match="seed"):
        native.leiden(np.array([0], dtype=np.int64),
                      np.array([1], dtype=np.int64),
                      np.ones(1), n_nodes=2, algo="CPMVertexPartition",
                      seed=-5)


def test_count_kmers_k_validated_before_alloc(tmp_path):
    if not native.native_available():
        pytest.skip("native unavailable")
    fa = tmp_path / "a.fa"
    fa.write_text(">a\nAGTC\n")
    with native.NativeFasta(str(fa)) as nf:
        with pytest.raises(ValueError, match="1 <= k <= 12"):
            nf.count_kmers(16)


def test_encode_fasta_cr_file_matches_python_path(tmp_path):
    # the byte-level safety gate must route CR files to the Python encoder
    from seekr_tpu.io.encode import encode_fasta, encode_seqs

    fa = tmp_path / "cr.fa"
    fa.write_bytes(b">h\nAC\rGT\n>i\nAAAA\n")
    enc = encode_fasta(str(fa), k=1)
    ref = encode_seqs(["ACGT", "AAAA"], k=1)
    assert list(enc.lengths) == list(ref.lengths)


# ---------------------------------------------------------------------------
# sortops: stable radix argsort + scatter + fused FDR (native/src/sortops.cpp)


@pytest.mark.parametrize("n", [0, 1, 2, 255, 256, 1000, 70000])
def test_argsort_matches_numpy_stable(n):
    rng = np.random.default_rng(n)
    x = rng.random(n)
    if n >= 1000:
        x[::7] = 0.5            # heavy ties exercise stability
        x[1], x[2] = 0.0, 1.0
        x[3], x[4] = -1.5, 2.5  # out-of-[0,1] values
        x[5], x[6] = np.inf, -np.inf
    order, sorted_vals = native.argsort_f64(x)
    ref = np.argsort(x, kind="stable")
    assert np.array_equal(order, ref)
    assert np.array_equal(sorted_vals, x[ref])


def test_argsort_constant_and_integer_keys():
    # constant input: every radix pass is skipped
    x = np.full(100000, 0.25)
    order, sorted_vals = native.argsort_f64(x)
    assert np.array_equal(order, np.arange(100000))
    assert np.array_equal(sorted_vals, x)
    # small-integer doubles: most digit positions constant -> passes skipped
    rng = np.random.default_rng(0)
    x = rng.integers(0, 50, 200000).astype(np.float64)
    assert np.array_equal(native.argsort_f64(x)[0],
                          np.argsort(x, kind="stable"))


def test_argsort_nan_tail_stable_order():
    x = np.array([0.3, np.nan, 0.1, np.nan, 0.2])
    order, _ = native.argsort_f64(x)
    assert np.array_equal(order, np.argsort(x, kind="stable"))


def test_argsort_negative_zero_is_valid_stable_sort():
    # documented divergence: -0.0 orders before +0.0 (numpy ties them);
    # still a permutation whose gathered values are ==-equal to numpy's
    rng = np.random.default_rng(1)
    x = rng.random(1000)
    x[10], x[20], x[30] = 0.0, -0.0, 0.0
    order, sorted_vals = native.argsort_f64(x)
    assert np.array_equal(np.sort(order), np.arange(1000))
    assert np.all(np.diff(sorted_vals) >= 0)
    assert np.array_equal(sorted_vals, x[order])
    assert (sorted_vals == x[np.argsort(x, kind="stable")]).all()


def test_scatter_by_order_matches_fancy_index():
    rng = np.random.default_rng(2)
    n = 70000
    order = rng.permutation(n).astype(np.int64)
    vals = rng.random(n)
    flags = vals > 0.5
    out_vals, out_flags = native.scatter_by_order(vals, order, flags=flags)
    exp = np.empty(n)
    exp[order] = vals
    expf = np.empty(n, bool)
    expf[order] = flags
    assert np.array_equal(out_vals, exp)
    assert np.array_equal(out_flags.view(bool), expf)
    only_vals, none_flags = native.scatter_by_order(vals, order)
    assert np.array_equal(only_vals, exp) and none_flags is None


def test_scatter_by_order_rejects_bad_index():
    order = np.array([0, 1, 7], dtype=np.int64)  # 7 out of range
    with pytest.raises(ValueError):
        native.scatter_by_order(np.zeros(3), order)


def test_scatter_by_order_debug_check_catches_duplicates(monkeypatch):
    # duplicates are UB across scatter threads; the opt-in debug check
    # (SEEKR_TPU_CHECK_SCATTER=1) must reject them before the C++ runs
    monkeypatch.setenv("SEEKR_TPU_CHECK_SCATTER", "1")
    dup = np.array([0, 1, 1], dtype=np.int64)
    with pytest.raises(ValueError, match="not a permutation"):
        native.scatter_by_order(np.zeros(3), dup)
    # a valid permutation still goes through with the check enabled
    ok = np.array([2, 0, 1], dtype=np.int64)
    out, _ = native.scatter_by_order(np.array([10.0, 20.0, 30.0]), ok)
    exp = np.empty(3)
    exp[ok] = [10.0, 20.0, 30.0]
    assert np.array_equal(out, exp)
    # negative indices WRAP in numpy fancy assignment, so the old
    # seen-mask test alone passed [-1, 0, 1] (review finding): the
    # debug check must reject them explicitly, pre-C++
    neg = np.array([-1, 0, 1], dtype=np.int64)
    with pytest.raises(ValueError, match="out-of-range"):
        native.scatter_by_order(np.zeros(3), neg)


@pytest.mark.parametrize("by", [False, True])
def test_fused_fdr_bitwise_vs_numpy_math(by):
    rng = np.random.default_rng(3)
    n = 200001
    p = np.round(rng.random(n), 3)  # ecdf-like tie structure
    p[:50] = 0.0
    p[50:90] = 1.0
    # numpy reference math, exactly as multitest._fdr_correct writes it
    order = np.argsort(p, kind="stable")
    ps = p[order]
    ecdf = np.arange(1.0, n + 1.0)
    ecdf /= n
    if by:
        harmonic = np.arange(1.0, n + 1.0)
        np.reciprocal(harmonic, out=harmonic)
        ecdf /= harmonic.sum()
    corr = ps / ecdf
    np.minimum.accumulate(corr[::-1], out=corr[::-1])
    np.clip(corr, 0, 1, out=corr)
    ecdf *= 0.05
    below = ps <= ecdf
    cf = np.empty_like(corr)
    cf[order] = corr
    rej_sorted = np.zeros(n, bool)
    if below.any():
        rej_sorted[: below.nonzero()[0].max() + 1] = True
    rej = np.zeros(n, bool)
    rej[order] = rej_sorted
    H = 0.0
    if by:
        harmonic = np.arange(1.0, n + 1.0)
        np.reciprocal(harmonic, out=harmonic)
        H = float(harmonic.sum())
    c2, r2, n_rej = native.fdr_adjust(p, 0.05, harmonic_sum=H)
    assert cf.tobytes() == c2.tobytes()
    assert np.array_equal(rej, r2)
    assert n_rej == int(rej_sorted.sum())
    # sorted-domain entry agrees with the fused one
    c3, n_rej3 = native.fdr_sorted(ps, 0.05, harmonic_sum=H)
    assert c3.tobytes() == corr.tobytes() and n_rej3 == n_rej


def test_fused_fdr_rejects_nan():
    p = np.array([0.1, np.nan, 0.3])
    with pytest.raises(ValueError):
        native.fdr_adjust(p, 0.05)


# ---------------------------------------------------------------------------
# statops: symmetric test + triu gather/fill at production scale (m >= 2048,
# above the native gate, directly against the numpy formulations)


def _sym_matrix(rng, m):
    a = rng.random((m, m))
    return np.round((a + a.T) / 2, 6)


def test_statops_sym_round5_scale_and_edges():
    rng = np.random.default_rng(0)
    m = 2100
    s = _sym_matrix(rng, m)
    assert native.sym_round5(s)
    # sub-rounding-noise asymmetry stays symmetric under round-to-5dp
    s2 = s.copy()
    s2[7, m - 3] += 1e-9
    assert native.sym_round5(s2)
    # above-rounding asymmetry detected (early-exit path), in a far tile
    s3 = s.copy()
    s3[m - 5, 2] += 1e-3
    assert not native.sym_round5(s3)
    # NaN == NaN mirror pair is symmetric; single-sided NaN is not
    s4 = s.copy()
    s4[100, 200] = s4[200, 100] = np.nan
    assert native.sym_round5(s4)
    s5 = s.copy()
    s5[100, 200] = np.nan
    assert not native.sym_round5(s5)
    # round-half-even boundary behaves exactly like np.round
    s6 = s.copy()
    s6[0, 1], s6[1, 0] = 0.000015, 0.000025  # both round to 2e-05
    assert native.sym_round5(s6) == bool(
        (np.round(s6, 5) == np.round(s6, 5).T).all())


def test_statops_triu_roundtrip_at_scale():
    rng = np.random.default_rng(1)
    m = 2100
    mat = rng.random((m, m))
    tv = native.triu_values_f64(mat)
    assert np.array_equal(tv, mat[np.triu_indices(m, 1)])
    filled = native.triu_fill_f64(m, tv)
    ref = np.full((m, m), np.nan)
    ref[np.triu_indices(m, 1)] = tv
    assert np.array_equal(filled, ref, equal_nan=True)
    # non-NaN fill value
    filled0 = native.triu_fill_f64(m, tv, fill=-1.0)
    ref0 = np.full((m, m), -1.0)
    ref0[np.triu_indices(m, 1)] = tv
    assert np.array_equal(filled0, ref0)


def test_host_sort_env_gates_statops_paths(monkeypatch):
    """SEEKR_TPU_HOST_SORT=numpy must disable EVERY host-stats native
    kernel; the public wrappers must give identical results either way."""
    import pandas as pd
    from seekr_tpu.stats.adj_pval import adj_pval, is_symmetric
    from seekr_tpu.utils import adj as adj_utils

    rng = np.random.default_rng(2)
    m = 2100
    s = _sym_matrix(rng, m)
    np.fill_diagonal(s, 0.0)
    df = pd.DataFrame(s)

    monkeypatch.setenv("SEEKR_TPU_HOST_SORT", "numpy")
    assert is_symmetric(df)
    ref = adj_pval(df, method="fdr_bh")
    tv_ref = adj_utils.triu_values(s)
    monkeypatch.setenv("SEEKR_TPU_HOST_SORT", "native")
    assert is_symmetric(df)
    got = adj_pval(df, method="fdr_bh")
    tv_got = adj_utils.triu_values(s)
    assert np.array_equal(tv_ref, tv_got)
    assert np.array_equal(ref.to_numpy(), got.to_numpy(), equal_nan=True)


def test_sortops_thread_safety():
    """The sort/FDR entries are stateless: concurrent calls from Python
    threads must not interfere (guards against hidden statics)."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(7)
    inputs = [np.round(rng.random(120_000), 3) for _ in range(8)]
    expected = [np.argsort(p, kind="stable") for p in inputs]

    def work(i):
        o, s = native.argsort_f64(inputs[i])
        c, r, n_rej = native.fdr_adjust(inputs[i], 0.05)
        return o, s, c

    with ThreadPoolExecutor(4) as pool:
        results = list(pool.map(work, range(8)))
    for i, (o, s, c) in enumerate(results):
        assert np.array_equal(o, expected[i])
        assert np.array_equal(s, inputs[i][expected[i]])
        c2, _, _ = native.fdr_adjust(inputs[i], 0.05)
        assert c.tobytes() == c2.tobytes()


@pytest.mark.parametrize("pattern", [
    "sorted", "reversed", "all_equal", "denormals", "two_values", "huge"])
def test_argsort_adversarial_patterns(pattern):
    rng = np.random.default_rng(hash(pattern) % (2 ** 32))
    n = 70001
    if pattern == "sorted":
        x = np.sort(rng.random(n))
    elif pattern == "reversed":
        x = np.sort(rng.random(n))[::-1].copy()
    elif pattern == "all_equal":
        x = np.full(n, 0.123456789)
    elif pattern == "denormals":
        x = rng.random(n) * 5e-321  # varied subnormal bit patterns
    elif pattern == "two_values":
        x = np.where(rng.random(n) < 0.5, 0.25, 0.75)
    else:  # huge magnitudes and mixed signs
        x = rng.normal(scale=1e300, size=n)
    ref = np.argsort(x, kind="stable")
    o, s = native.argsort_f64(x)
    assert np.array_equal(o, ref)
    assert np.array_equal(s, x[ref])
