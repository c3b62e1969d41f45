"""Warm-resident similarity service (seekr_tpu/serve.py)."""

import threading

import numpy as np
import pytest

from seekr_tpu.serve import SeekrService, request, serve_forever

K = 3
DIGIT2CHAR = np.array(list("AGTC"))


def _seqs(rng, n, lo=60, hi=200):
    return ["".join(DIGIT2CHAR[rng.integers(0, 4,
                                            size=int(rng.integers(lo, hi)))])
            for _ in range(n)]


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    mean = rng.uniform(0.5, 2.0, 4 ** K)
    std = rng.uniform(0.5, 2.0, 4 ** K)
    np.save(tmp / "mean.npy", mean)
    np.save(tmp / "std.npy", std)
    targets = tmp / "targets.fa"
    seqs = _seqs(rng, 6)
    targets.write_text("\n".join(f">t{i}\n{s}" for i, s in enumerate(seqs))
                       + "\n")
    return tmp, seqs


def _oracle_chain(query_seqs, target_fa, mean, std, tmp):
    """The artifact chain the service must match: counters + pearson +
    fitted p-values, exactly as the CLI path computes them."""
    from seekr_tpu.models.counter import KmerCounter
    from seekr_tpu.models.pearson import pearson

    qc = KmerCounter(None, k=K, mean=mean, std=std, log2="Log2.post",
                     silent=True)
    qc.seqs = list(query_seqs)
    qc.get_counts()
    tc = KmerCounter(str(target_fa), k=K, mean=mean, std=std,
                     log2="Log2.post", silent=True)
    tc.get_counts()
    return np.asarray(pearson(qc.counts, tc.counts))


def test_query_matches_cli_chain(artifacts):
    tmp, _ = artifacts
    rng = np.random.default_rng(1)
    queries = _seqs(rng, 4)
    mean, std = np.load(tmp / "mean.npy"), np.load(tmp / "std.npy")

    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    out = svc.query(queries, want=("sim",))
    want = _oracle_chain(queries, tmp / "targets.fa", mean, std, tmp)
    np.testing.assert_allclose(out["sim"], want, rtol=1e-5, atol=1e-6)
    assert out["m"] == 4 and out["n"] == 6
    assert svc.target_names == [f"t{i}" for i in range(6)]


def test_self_similarity_without_targets(artifacts):
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K)
    queries = _seqs(np.random.default_rng(2), 3)
    out = svc.query(queries)
    sim = np.asarray(out["sim"])
    assert sim.shape == (3, 3)
    np.testing.assert_allclose(sim, sim.T, rtol=1e-5, atol=1e-6)


def test_fitted_pvals_match_find_pval_math(artifacts):
    tmp, _ = artifacts
    fitres = [("norm", 0.01, (0.0, 0.25))]
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"), fitres=fitres)
    queries = _seqs(np.random.default_rng(3), 2)
    out = svc.query(queries, want=("sim", "pvals"))
    from scipy import stats as spstats

    want = (1.0 - spstats.norm(0.0, 0.25).cdf(np.asarray(out["sim"])))
    np.testing.assert_allclose(out["pvals"], want.astype(np.float32),
                               rtol=1e-6, atol=1e-7)


def test_empirical_pvals(artifacts):
    tmp, _ = artifacts
    bkg = np.sort(np.random.default_rng(4).normal(0, 0.3, 5000))
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       fitres=bkg)
    out = svc.query(_seqs(np.random.default_rng(5), 3), want=("pvals",))
    p = np.asarray(out["pvals"])
    assert ((0.0 <= p) & (p <= 1.0)).all()


def test_pvals_without_fitres_is_actionable(artifacts):
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K)
    with pytest.raises(ValueError, match="without fitres"):
        svc.query(["AGTCAGTC"], want=("pvals",))
    with pytest.raises(ValueError, match="unknown want"):
        svc.query(["AGTCAGTC"], want=("bogus",))
    with pytest.raises(ValueError, match="empty"):
        svc.query([])


def test_norm_vector_k_mismatch_rejected(artifacts):
    tmp, _ = artifacts
    with pytest.raises(ValueError, match="4\\^k"):
        SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=5)


def test_socket_round_trip(artifacts, tmp_path):
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"),
                       fitres=[("norm", 0.01, (0.0, 0.25))])
    sock = str(tmp_path / "seekr.sock")
    ready = threading.Event()
    t = threading.Thread(target=serve_forever, args=(svc, sock, ready),
                         daemon=True)
    t.start()
    assert ready.wait(30)

    pong = request(sock, {"op": "ping"})
    assert pong["ok"] and pong["k"] == K and pong["targets"] == 6
    assert pong["pvals_available"] is True

    queries = _seqs(np.random.default_rng(6), 2)
    resp = request(sock, {"seqs": queries, "want": ["sim", "pvals"]})
    assert resp["ok"] and resp["m"] == 2 and resp["n"] == 6
    mean, std = np.load(tmp / "mean.npy"), np.load(tmp / "std.npy")
    want = _oracle_chain(queries, tmp / "targets.fa", mean, std, tmp)
    np.testing.assert_allclose(np.asarray(resp["sim"]), want,
                               rtol=1e-5, atol=1e-6)

    bad = request(sock, {"seqs": [], "want": ["sim"]})
    assert bad["ok"] is False and "empty" in bad["error"]

    pong2 = request(sock, {"op": "ping"})
    assert pong2["queries_served"] == 1  # the failed query didn't count

    # artifact mode: big results land on disk, not in the JSON
    prefix = str(tmp_path / "out")
    resp3 = request(sock, {"seqs": queries, "want": ["sim"],
                           "outfile": prefix})
    assert resp3["ok"] and "sim" not in resp3
    got = np.load(resp3["files"]["sim"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    down = request(sock, {"op": "shutdown"})
    assert down["ok"]
    t.join(timeout=30)
    assert not t.is_alive()


def test_cli_serve_registered():
    from seekr_tpu import cli

    parser = cli._collect_parser(cli.console_serve)
    flags = {o for a in parser._actions for o in a.option_strings}
    assert {"--socket", "-t", "-fr", "--no-warmup"} <= flags
    assert "seekr_tpu_serve" in cli._entry_commands()


def test_query_padding_invisible(artifacts):
    # batches are padded to a power of two to bound the compiled-shape
    # space; the dummy rows must never leak into results (non-pow2 Q,
    # both with targets and in the self-similarity mode)
    tmp, target_seqs = artifacts
    rng = np.random.default_rng(5)
    queries = _seqs(rng, 3)  # pads to 4

    svc = SeekrService(mean=str(tmp / "mean.npy"), std=str(tmp / "std.npy"),
                       k=K, targets=str(tmp / "targets.fa"))
    out = svc.query(queries, want=("sim",))
    assert out["sim"].shape == (3, len(target_seqs))
    want = _oracle_chain(queries, str(tmp / "targets.fa"),
                         str(tmp / "mean.npy"), str(tmp / "std.npy"), tmp)
    np.testing.assert_allclose(out["sim"], want, rtol=1e-4, atol=1e-5)

    svc_self = SeekrService(mean=str(tmp / "mean.npy"),
                            std=str(tmp / "std.npy"), k=K)
    out = svc_self.query(queries, want=("sim",))
    assert out["sim"].shape == (3, 3)
    np.testing.assert_allclose(np.diag(out["sim"]), 1.0, rtol=1e-4)
