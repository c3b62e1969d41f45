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
    # artifact mode is opt-in (VERDICT r3): allow writes under tmp_path
    t = threading.Thread(target=serve_forever, args=(svc, sock, ready),
                         kwargs={"artifact_dir": str(tmp_path)},
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


def _assert_topk_idx_equal(got_idx, want_sim, want_idx, tol=1e-6):
    """Indices must match wherever values are distinct beyond the
    cross-path GEMM-retiling noise; near-ties may legally reorder."""
    got_idx, want_idx = np.asarray(got_idx), np.asarray(want_idx)
    want_sim = np.asarray(want_sim)
    mask = np.ones(want_idx.shape, bool)
    if want_sim.shape[1] > 1:
        near = np.abs(np.diff(want_sim, axis=1)) <= tol
        mask[:, :-1] &= ~near
        mask[:, 1:] &= ~near
    np.testing.assert_array_equal(got_idx[mask], want_idx[mask])


def test_topk_matches_full_sim(artifacts):
    # device top-k must agree with sorting the full sim matrix: same
    # values, same (distinct-value) indices, pvals of exactly those
    tmp, target_seqs = artifacts
    queries = _seqs(np.random.default_rng(7), 3)  # pads to 4
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"),
                       fitres=[("norm", 0.01, (0.0, 0.25))])
    out = svc.query(queries, want=("sim", "topk", "topk_pvals"), topk=3)
    sim = np.asarray(out["sim"])
    assert out["topk_sim"].shape == (3, 3) == out["topk_idx"].shape

    order = np.argsort(-sim, axis=1, kind="stable")[:, :3]
    np.testing.assert_allclose(out["topk_sim"],
                               np.take_along_axis(sim, order, axis=1),
                               rtol=1e-6, atol=1e-7)
    # indices comparable only where values are distinct (ties: both
    # break toward the lower index, but float noise can flip order)
    np.testing.assert_array_equal(out["topk_idx"], order)

    from scipy import stats as spstats

    want_p = 1.0 - spstats.norm(0.0, 0.25).cdf(out["topk_sim"])
    np.testing.assert_allclose(out["topk_pvals"],
                               want_p.astype(np.float32),
                               rtol=1e-6, atol=1e-7)


def test_topk_self_similarity_never_returns_pad_rows(artifacts):
    # self-sim mode: the padded dummy columns are COPIES of the last
    # real row, so unmasked top-k would "find" them; every returned
    # index must be < q, and topk clamps to q
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K)
    queries = _seqs(np.random.default_rng(8), 3)  # pads to 4
    out = svc.query(queries, want=("topk",), topk=100)
    assert out["topk_sim"].shape == (3, 3)  # clamped to q real columns
    assert (np.asarray(out["topk_idx"]) < 3).all()
    # row's best self-match is itself (r = 1.0)
    np.testing.assert_array_equal(out["topk_idx"][:, 0], np.arange(3))
    np.testing.assert_allclose(out["topk_sim"][:, 0], 1.0, rtol=1e-4)


def test_topk_clamps_to_target_count(artifacts):
    tmp, target_seqs = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    out = svc.query(_seqs(np.random.default_rng(9), 2), want=("topk",),
                    topk=999)
    assert out["topk_sim"].shape == (2, len(target_seqs))
    # a full-width top-k is the full row, sorted
    full = svc.query(_seqs(np.random.default_rng(9), 2), want=("sim",))
    np.testing.assert_allclose(np.asarray(out["topk_sim"]),
                               -np.sort(-np.asarray(full["sim"]), axis=1),
                               rtol=1e-6, atol=1e-7)


def test_topk_socket_protocol(artifacts, tmp_path):
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    sock = str(tmp_path / "seekr_topk.sock")
    ready = threading.Event()
    t = threading.Thread(target=serve_forever, args=(svc, sock, ready),
                         daemon=True)
    t.start()
    assert ready.wait(30)
    queries = _seqs(np.random.default_rng(10), 2)
    resp = request(sock, {"seqs": queries, "want": ["topk"], "topk": 2})
    assert resp["ok"] and "sim" not in resp
    assert len(resp["topk_sim"]) == 2 and len(resp["topk_sim"][0]) == 2
    assert resp["topk_names"] == [[f"t{j}" for j in row]
                                  for row in resp["topk_idx"]]
    full = request(sock, {"seqs": queries, "want": ["sim"]})
    want = -np.sort(-np.asarray(full["sim"]), axis=1)[:, :2]
    np.testing.assert_allclose(np.asarray(resp["topk_sim"]), want,
                               rtol=1e-6, atol=1e-7)
    request(sock, {"op": "shutdown"})
    t.join(timeout=30)


def test_cli_query_client_round_trip(artifacts, tmp_path, capsys):
    # the client command: fasta in, CSV out, no device needed client-side
    tmp, target_seqs = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    sock = str(tmp_path / "q.sock")
    ready = threading.Event()
    t = threading.Thread(target=serve_forever, args=(svc, sock, ready),
                         daemon=True)
    t.start()
    assert ready.wait(30)

    queries = _seqs(np.random.default_rng(11), 3)
    qfa = tmp_path / "queries.fa"
    qfa.write_text("\n".join(f">q{i}\n{s}" for i, s in enumerate(queries))
                   + "\n")
    from seekr_tpu import cli

    # full matrix to a csv file, labeled by query/target headers
    out_csv = tmp_path / "sim.csv"
    cli.console_query([str(qfa), "--socket", sock, "-o", str(out_csv)])
    import pandas as pd

    df = pd.read_csv(out_csv, index_col=0)
    assert list(df.index) == ["q0", "q1", "q2"]
    assert list(df.columns) == [f"t{i}" for i in range(len(target_seqs))]
    want = _oracle_chain(queries, tmp / "targets.fa",
                         np.load(tmp / "mean.npy"), np.load(tmp / "std.npy"),
                         tmp)
    np.testing.assert_allclose(df.values, want, rtol=1e-5, atol=1e-6)

    # topk tidy rows to stdout
    capsys.readouterr()
    cli.console_query([str(qfa), "--socket", sock, "--topk", "2"])
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "query,rank,target,r"
    assert len(lines) == 1 + 3 * 2
    first = lines[1].split(",")
    best = int(np.argmax(want[0]))
    assert first[:3] == ["q0", "0", f"t{best}"]
    np.testing.assert_allclose(float(first[3]), want[0, best], rtol=1e-5)

    request(sock, {"op": "shutdown"})
    t.join(timeout=30)


def test_cli_query_registered():
    from seekr_tpu import cli

    parser = cli._collect_parser(cli.console_query)
    flags = {o for a in parser._actions for o in a.option_strings}
    assert {"--socket", "--topk", "--pvals", "--npy", "-o"} <= flags
    assert "seekr_tpu_query" in cli._entry_commands()


def test_coalesced_queries_match_serial(artifacts):
    # hold the device lock, fire concurrent requests with MIXED wants
    # (full sim, topk of different sizes, pvals), release: one leader
    # must answer all of them in ONE device pass, each result matching
    # the serial (coalesce=False) path
    tmp, target_seqs = artifacts
    fitres = [("norm", 0.01, (0.0, 0.25))]
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"), fitres=fitres)
    ref = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"), fitres=fitres,
                       coalesce=False)
    rng = np.random.default_rng(12)
    reqs = [
        (_seqs(rng, 2), ("sim",), 10),
        (_seqs(rng, 3), ("topk",), 2),
        (_seqs(rng, 1), ("topk", "topk_pvals"), 4),
        (_seqs(rng, 4), ("sim", "pvals"), 10),
    ]
    results = [None] * len(reqs)

    def run(i):
        seqs, want, topk = reqs[i]
        results[i] = svc.query(seqs, want=want, topk=topk)

    svc._lock.acquire()
    try:
        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        deadline = 30.0
        import time

        t0 = time.monotonic()
        while len(svc._queue) < len(reqs):
            assert time.monotonic() - t0 < deadline, "requests never queued"
            time.sleep(0.01)
    finally:
        svc._lock.release()
    for t in threads:
        t.join(timeout=60)
        assert not t.is_alive()

    assert svc.device_batches == 1  # ONE pass answered all four
    assert svc.queries_served == len(reqs)
    for (seqs, want, topk), got in zip(reqs, results):
        want_out = ref.query(seqs, want=want, topk=topk)
        assert got["m"] == want_out["m"] and got["n"] == want_out["n"]
        for key in ("sim", "pvals", "topk_sim", "topk_pvals"):
            if key in want_out:
                # counting + the segmented Log2.post shift are bitwise;
                # the merged Pearson GEMM may retile — ulp-level on the
                # CPU backend, ~2e-5 rel on real TPU (bf16x3 tiles), so
                # the repo-standard Pearson tolerance applies
                np.testing.assert_allclose(got[key], want_out[key],
                                           rtol=1e-4, atol=1e-6,
                                           err_msg=key)
        if "topk_idx" in want_out:
            _assert_topk_idx_equal(got["topk_idx"], want_out["topk_sim"],
                                   want_out["topk_idx"])


def test_coalesced_single_request_is_serial_path(artifacts):
    # an uncontended service must not pay the coalescing machinery:
    # one request = one device batch through the serial internals
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    queries = _seqs(np.random.default_rng(13), 3)
    out = svc.query(queries, want=("sim",))
    assert svc.device_batches == 1 and svc.queries_served == 1
    want = _oracle_chain(queries, tmp / "targets.fa",
                         np.load(tmp / "mean.npy"), np.load(tmp / "std.npy"),
                         tmp)
    np.testing.assert_allclose(out["sim"], want, rtol=1e-5, atol=1e-6)


def test_coalesced_hammer_consistency(artifacts):
    # 6 threads x 4 queries each, no orchestration: every response must
    # equal its serial oracle regardless of how requests merged
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    ref = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"), coalesce=False)
    per_thread = 4
    errs, outs = [], {}

    def run(tid):
        rng = np.random.default_rng(100 + tid)
        try:
            mine = []
            for _ in range(per_thread):
                seqs = _seqs(rng, int(rng.integers(1, 4)))
                mine.append((seqs, svc.query(seqs, want=("topk",), topk=3)))
            outs[tid] = mine
        except Exception as err:  # noqa: BLE001
            errs.append(err)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive()
    assert not errs
    assert svc.queries_served == 6 * per_thread
    for mine in outs.values():
        for seqs, got in mine:
            want_out = ref.query(seqs, want=("topk",), topk=3)
            np.testing.assert_allclose(got["topk_sim"],
                                       want_out["topk_sim"],
                                       rtol=1e-4, atol=1e-6)
            _assert_topk_idx_equal(got["topk_idx"], want_out["topk_sim"],
                                   want_out["topk_idx"])


def test_coalesce_row_cap_splits_batches(artifacts):
    # with the cap forced tiny, a burst must split into several device
    # passes — every leader loops until its own item is done, so no
    # request can strand behind the cap
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    ref = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"), coalesce=False)
    svc.max_coalesce_rows = 3
    rng = np.random.default_rng(14)
    reqs = [_seqs(rng, 2) for _ in range(5)]  # 10 rows > 3-row cap
    results = [None] * len(reqs)

    def run(i):
        results[i] = svc.query(reqs[i], want=("topk",), topk=2)

    svc._lock.acquire()
    try:
        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        import time

        t0 = time.monotonic()
        while len(svc._queue) < len(reqs):
            assert time.monotonic() - t0 < 30
            time.sleep(0.01)
    finally:
        svc._lock.release()
    for t in threads:
        t.join(timeout=60)
        assert not t.is_alive()
    assert svc.device_batches >= 5  # 2-row requests can't pair under cap 3
    assert svc.queries_served == 5
    for seqs, got in zip(reqs, results):
        want_out = ref.query(seqs, want=("topk",), topk=2)
        np.testing.assert_allclose(got["topk_sim"], want_out["topk_sim"],
                                   rtol=1e-4, atol=1e-6)


def _mesh():
    import jax

    from seekr_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    return make_mesh()


def test_mesh_service_matches_single_device(artifacts):
    """mesh= serving: corpus row-sharded over every device, top-k as a
    two-stage distributed selection — answers identical to the
    single-device service (parallel.dist.make_sharded_scorer)."""
    tmp, _ = artifacts
    svc_m = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                         targets=str(tmp / "targets.fa"),
                         fitres=[("norm", 0.01, (0.0, 0.25))], mesh=_mesh())
    svc_s = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                         targets=str(tmp / "targets.fa"),
                         fitres=[("norm", 0.01, (0.0, 0.25))])
    queries = _seqs(np.random.default_rng(21), 4)
    om = svc_m.query(queries, want=("sim", "topk", "topk_pvals"), topk=3)
    ow = svc_s.query(queries, want=("sim", "topk", "topk_pvals"), topk=3)
    np.testing.assert_allclose(om["sim"], ow["sim"], rtol=1e-5, atol=1e-6)
    assert np.array_equal(om["topk_idx"], ow["topk_idx"])
    np.testing.assert_allclose(om["topk_sim"], ow["topk_sim"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(om["topk_pvals"], ow["topk_pvals"],
                               rtol=1e-5, atol=1e-6)
    assert svc_m.target_names == svc_s.target_names
    # warmup covers the mesh executables (sharded sim + distributed
    # top-k) without touching the single-device top-k path
    svc_m.warmup(lengths=(64,), max_batch=2, topk=2)


def test_mesh_service_requires_targets(artifacts):
    tmp, _ = artifacts
    with pytest.raises(ValueError, match="mesh serving requires targets"):
        SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                     mesh=_mesh())


def test_mesh_coalesced_matches_serial(artifacts):
    """Requests coalesced into one device batch on the MESH service give
    the same answers as the serial single-device path."""
    tmp, _ = artifacts
    svc_m = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                         targets=str(tmp / "targets.fa"), mesh=_mesh())
    svc_s = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                         targets=str(tmp / "targets.fa"), coalesce=False)
    rng = np.random.default_rng(22)
    reqs = [_seqs(rng, 2) for _ in range(6)]
    results = [None] * len(reqs)

    def run(i):
        results[i] = svc_m.query(reqs[i], want=("topk", "sim"), topk=2)

    # hold the device lock so every request queues, then release: one
    # leader drains the whole burst in merged device passes
    svc_m._lock.acquire()
    try:
        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        import time

        t0 = time.monotonic()
        while len(svc_m._queue) < len(reqs):
            assert time.monotonic() - t0 < 30
            time.sleep(0.01)
    finally:
        svc_m._lock.release()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive()
    assert svc_m.device_batches < len(reqs)  # something actually merged
    for seqs, got in zip(reqs, results):
        want_out = svc_s.query(seqs, want=("topk", "sim"), topk=2)
        np.testing.assert_allclose(got["sim"], want_out["sim"],
                                   rtol=1e-5, atol=1e-6)
        assert np.array_equal(got["topk_idx"], want_out["topk_idx"])
        np.testing.assert_allclose(got["topk_sim"], want_out["topk_sim"],
                                   rtol=1e-5, atol=1e-6)


def test_cli_serve_dp_requires_targets(artifacts, capsys):
    tmp, _ = artifacts
    from seekr_tpu.cli import console_serve

    with pytest.raises(SystemExit):
        console_serve([str(tmp / "mean.npy"), str(tmp / "std.npy"),
                       "-k", str(K), "-dp", "2"])
    assert "requires -t/--targets" in capsys.readouterr().err


def test_latency_stats_and_ping_telemetry(artifacts, tmp_path):
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    assert svc.latency_stats() == {"count": 0}
    for seed in (30, 31, 32):
        svc.query(_seqs(np.random.default_rng(seed), 2), want=("topk",),
                  topk=2)
    stats = svc.latency_stats()
    assert stats["count"] == 3
    assert 0 < stats["p50_ms"] <= stats["p95_ms"] <= stats["p99_ms"]
    assert stats["p99_ms"] <= stats["max_ms"]
    # rejected requests never enter the distribution
    with pytest.raises(ValueError):
        svc.query([], want=("sim",))
    assert svc.latency_stats()["count"] == 3

    # the stats ride the ping op over the socket
    sock = str(tmp_path / "lat.sock")
    ready = threading.Event()
    t = threading.Thread(target=serve_forever, args=(svc, sock, ready),
                         daemon=True)
    t.start()
    assert ready.wait(10)
    try:
        pong = request(sock, {"op": "ping"})
        assert pong["ok"] and pong["latency"]["count"] == 3
        assert pong["device_batches"] == svc.device_batches
    finally:
        request(sock, {"op": "shutdown"})
        t.join(timeout=10)


def test_add_targets_matches_incremental_chains(artifacts):
    """Growing the corpus live == counting the new batch in its own
    chain and concatenating artifacts (Log2.post's global-|min| shift
    is batch-local), with the ORIGINAL columns bit-for-bit stable."""
    tmp, seqs = artifacts
    rng = np.random.default_rng(33)
    extra = _seqs(rng, 3)
    queries = _seqs(rng, 2)

    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    before = svc.query(queries, want=("sim",))
    assert svc.add_targets(extra, names=["x0", "x1", "x2"]) == (9, 3)
    assert svc.target_names == [f"t{i}" for i in range(6)] + ["x0", "x1",
                                                              "x2"]
    after = svc.query(queries, want=("sim", "topk"), topk=9)
    sim = np.asarray(after["sim"])

    # original target columns are bit-for-bit where they were: stored
    # client indices AND scores survive the update
    np.testing.assert_array_equal(sim[:, :6], np.asarray(before["sim"]))
    # the added columns score as their own chain (same norm vectors)
    only_extra = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"),
                              k=K, targets=extra)
    np.testing.assert_allclose(sim[:, 6:],
                               only_extra.query(queries)["sim"],
                               rtol=1e-5, atol=1e-6)
    # top-k is consistent with the grown matrix
    assert np.array_equal(after["topk_idx"],
                          np.argsort(-sim, axis=1, kind="stable"))


def test_add_targets_mesh_reshards(artifacts):
    """Same update semantics through the mesh-sharded scorer: the
    re-shard must agree with a single-device service grown the same
    way (and continue auto-numbering)."""
    tmp, seqs = artifacts
    rng = np.random.default_rng(34)
    extra = _seqs(rng, 4)
    queries = _seqs(rng, 2)
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"), mesh=_mesh())
    assert svc.add_targets(extra) == (10, 4)
    assert svc.target_names[-1] == "t9"  # auto-numbering continues
    got = svc.query(queries, want=("sim", "topk"), topk=4)
    single = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"),
                          k=K, targets=str(tmp / "targets.fa"))
    single.add_targets(extra)
    want_out = single.query(queries, want=("sim", "topk"), topk=4)
    np.testing.assert_allclose(got["sim"], want_out["sim"],
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(got["topk_idx"], want_out["topk_idx"])


def test_growth_under_concurrent_load(artifacts):
    """Queries racing live corpus growth: every answer must be
    internally consistent with ONE corpus snapshot (the device lock
    makes each query-vs-swap atomic), and the append-only contract
    holds throughout — the original 6 columns are bit-for-bit stable
    in every response regardless of when it interleaved with a grow."""
    tmp, _ = artifacts
    rng = np.random.default_rng(44)
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    queries = _seqs(rng, 2)
    base = np.asarray(svc.query(queries, want=("sim",))["sim"])
    batches = [_seqs(rng, 2) for _ in range(3)]
    valid_sizes = {6, 8, 10, 12}
    outs, errs = [], []
    out_lock = threading.Lock()

    def client():
        try:
            for _ in range(6):
                out = svc.query(queries, want=("sim", "topk"), topk=20)
                with out_lock:
                    outs.append(out)
        except Exception as err:  # noqa: BLE001 — collected for assert
            errs.append(err)

    def grower():
        try:
            for batch in batches:
                svc.add_targets(batch)
        except Exception as err:  # noqa: BLE001 — collected for assert
            errs.append(err)

    threads = [threading.Thread(target=client) for _ in range(4)]
    threads.append(threading.Thread(target=grower))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "serving deadlocked under growth load"
    assert not errs, errs
    assert svc._n_targets == 12
    # the clients may all have finished before the last grow landed —
    # one final query pins the 12-corpus answer path
    outs.append(svc.query(queries, want=("sim", "topk"), topk=20))
    saw_sizes = set()
    for out in outs:
        n = out["n"]
        saw_sizes.add(n)
        assert n in valid_sizes
        sim = np.asarray(out["sim"])
        assert sim.shape == (2, n)
        # append-only: stored indices AND scores survive every grow
        np.testing.assert_array_equal(sim[:, :6], base)
        idx = np.asarray(out["topk_idx"])
        vals = np.asarray(out["topk_sim"])
        assert idx.shape == vals.shape == (2, n)  # topk=20 clamps to n
        assert idx.min() >= 0 and idx.max() < n
        # top-k is the sorted row of the SAME snapshot's sim matrix
        np.testing.assert_allclose(vals, -np.sort(-sim, axis=1),
                                   rtol=0, atol=0)
    assert 12 in saw_sizes  # at least the final corpus was served


def test_add_targets_validation(artifacts, tmp_path):
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    with pytest.raises(ValueError, match="exactly one"):
        svc.add_targets()
    with pytest.raises(ValueError, match="exactly one"):
        svc.add_targets(["AGTC" * 20], fasta="x.fa")
    with pytest.raises(ValueError, match="names for"):
        svc.add_targets(["AGTC" * 20], names=["a", "b"])
    with pytest.raises(ValueError, match="empty target batch"):
        svc.add_targets([])
    selfsim = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"),
                           k=K)
    with pytest.raises(ValueError, match="without targets"):
        selfsim.add_targets(["AGTC" * 20])

    # fasta flavor over the socket protocol
    rng = np.random.default_rng(35)
    fa = tmp_path / "extra.fa"
    fa.write_text(">e0\n" + _seqs(rng, 1)[0] + "\n")
    sock = str(tmp_path / "add.sock")
    ready = threading.Event()
    t = threading.Thread(target=serve_forever, args=(svc, sock, ready),
                         daemon=True)
    t.start()
    assert ready.wait(10)
    try:
        resp = request(sock, {"op": "add_targets", "fasta": str(fa)})
        assert resp == {"ok": True, "n": 7, "added": 1}
        assert svc.target_names[-1] == "e0"
        out = request(sock, {"seqs": _seqs(rng, 1), "want": ["topk"],
                             "topk": 7})
        assert out["ok"] and out["n"] == 7
        assert len(out["topk_names"][0]) == 7
    finally:
        request(sock, {"op": "shutdown"})
        t.join(timeout=10)


def test_save_corpus_round_trip(artifacts, tmp_path):
    """ADVICE r3: snapshot save -> restart-from-.npz bit-identity,
    including add_targets growth taken before the snapshot."""
    tmp, _ = artifacts
    rng = np.random.default_rng(40)
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    svc.add_targets(_seqs(rng, 2), names=["g0", "g1"])
    queries = _seqs(rng, 3)
    want = np.asarray(svc.query(queries, want=("sim",))["sim"])

    snap = str(tmp_path / "corpus.npz")
    assert svc.save_corpus(snap) == snap
    restarted = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"),
                             k=K, targets=snap)
    assert restarted.target_names == svc.target_names
    assert restarted.target_names[-2:] == ["g0", "g1"]
    got = np.asarray(restarted.query(queries, want=("sim",))["sim"])
    # exact: the standardized float32 rows round-trip bit-for-bit
    np.testing.assert_array_equal(got, want)


def test_save_corpus_validation(artifacts, tmp_path):
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    with pytest.raises(ValueError, match="end in .npz"):
        svc.save_corpus(str(tmp_path / "corpus.weird"))
    selfsim = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"),
                           k=K)
    with pytest.raises(ValueError, match="no corpus to save"):
        selfsim.save_corpus(str(tmp_path / "c.npz"))

    snap = str(tmp_path / "corpus.npz")
    svc.save_corpus(snap)
    # k mismatch (different-k norm vectors, same snapshot)
    rng = np.random.default_rng(41)
    np.save(tmp_path / "mean2.npy", rng.uniform(0.5, 2.0, 4 ** (K + 1)))
    np.save(tmp_path / "std2.npy", rng.uniform(0.5, 2.0, 4 ** (K + 1)))
    with pytest.raises(ValueError, match="k="):
        SeekrService(str(tmp_path / "mean2.npy"), str(tmp_path / "std2.npy"),
                     k=K + 1, targets=snap)
    # log2 mismatch
    with pytest.raises(ValueError, match="log2"):
        SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                     log2="Log2.none", targets=snap)
    # norm-vector mismatch (same k, different values)
    np.save(tmp_path / "mean3.npy", rng.uniform(0.5, 2.0, 4 ** K))
    with pytest.raises(ValueError, match="DIFFERENT"):
        SeekrService(str(tmp_path / "mean3.npy"), str(tmp / "std.npy"),
                     k=K, targets=snap)
    # not-a-snapshot npz
    bogus = tmp_path / "bogus.npz"
    np.savez(str(bogus), something=np.zeros(3))
    with pytest.raises(ValueError, match="not a seekr_tpu corpus"):
        SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                     targets=str(bogus))
    # future format version
    with np.load(snap) as z:
        parts = dict(z)
    parts["format"] = np.int64(2)
    future = tmp_path / "future.npz"
    np.savez(str(future), **parts)
    with pytest.raises(ValueError, match="newer"):
        SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                     targets=str(future))


def test_save_corpus_atomic_write(artifacts, tmp_path, monkeypatch):
    """A crash mid-write must not leave a truncated .npz at the target
    path (ADVICE r3: temp file + os.replace)."""
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    snap = tmp_path / "corpus.npz"

    def boom(*a, **k):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(np, "savez", boom)
    with pytest.raises(OSError):
        svc.save_corpus(str(snap))
    assert not snap.exists()  # path absent, not truncated
    assert not list(tmp_path.glob("*.npz.tmp"))  # temp cleaned up


def test_grow_budget_refusal(artifacts):
    """add_targets past the corpus memory budget is refused with the
    measured numbers; the resident corpus and service stay intact
    (VERDICT r3 weak #4)."""
    tmp, _ = artifacts
    rng = np.random.default_rng(50)
    # 6 initial targets, quantum 8: resident = 8 x 64 x 4 = 2048 B.
    # Budget 2048 admits grows up to 8 total rows and refuses the 9th.
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"),
                       mem_budget_bytes=2048, grow_quantum=8)
    assert svc.add_targets(_seqs(rng, 2))[0] == 8  # fills the quantum
    with pytest.raises(ValueError) as exc:
        svc.add_targets(_seqs(rng, 1))
    msg = str(exc.value)
    assert "refused" in msg and "2,048-byte" in msg
    assert "16 rows" in msg and "64" in msg  # the measured numbers
    assert svc._n_targets == 8  # corpus unchanged
    out = svc.query(_seqs(rng, 2), want=("sim",))  # still serving
    assert np.asarray(out["sim"]).shape == (2, 8)


def test_grow_quantum_bounds_executables(artifacts):
    """N within-quantum grows keep the resident WIDTH (the compile key
    of every sim/topk executable) constant — and therefore existing
    targets' scores bit-for-bit identical (VERDICT r3 weak #4)."""
    tmp, _ = artifacts
    rng = np.random.default_rng(51)
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"), grow_quantum=64)
    assert int(svc._targets_std.shape[0]) == 64  # quantized from load
    queries = _seqs(rng, 3)
    before = np.asarray(svc.query(queries, want=("sim",))["sim"])
    for i in range(10):  # 10 one-row grows, zero width changes
        svc.add_targets(_seqs(rng, 1))
        assert int(svc._targets_std.shape[0]) == 64
    after = svc.query(queries, want=("sim", "topk"), topk=16)
    sim = np.asarray(after["sim"])
    assert sim.shape == (3, 16)
    # same width -> same executable -> original columns bit-identical
    np.testing.assert_array_equal(sim[:, :6], before)
    # top-k can see the grown targets but never a pad column
    assert np.asarray(after["topk_idx"]).max() < 16
    # crossing the quantum boundary re-pads to the next multiple
    svc.add_targets(_seqs(rng, 60))
    assert svc._n_targets == 76
    assert int(svc._targets_std.shape[0]) == 128


def test_grow_quantum_mesh_reuses_executables(artifacts):
    """Mesh path: a within-quantum grow preserves the scorer's compiled
    executables (t_real is traced, shapes unchanged)."""
    import jax
    from jax.sharding import Mesh

    tmp, _ = artifacts
    rng = np.random.default_rng(52)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"), mesh=mesh,
                       grow_quantum=32)
    queries = _seqs(rng, 2)
    out1 = svc.query(queries, want=("topk",), topk=4)
    impls_before = dict(svc._scorer._impls)
    assert impls_before  # something compiled
    svc.add_targets(_seqs(rng, 3))  # 6 -> 9, within the 32 quantum
    assert svc._scorer.t_loc * svc._scorer.n_dev == 32  # shape unchanged
    out2 = svc.query(queries, want=("topk",), topk=4)
    # the exact same compiled callables are still installed
    assert svc._scorer._impls == impls_before
    # and the grown targets are actually scored (top-k may now differ)
    assert np.asarray(out2["topk_idx"]).max() < 9
    np.testing.assert_array_equal(
        np.asarray(out1["topk_sim"]).shape, (2, 4))


def test_exact_fill_grow_keeps_topk_key_stable(artifacts, monkeypatch):
    """A grow that EXACTLY fills the quantization pad must not change
    the top-k executable's static key: `limit < t_cols` flips False at
    the boundary, and keying the mask on it would mint a recompile the
    width-quantization guarantee forbids (review finding).  Quantized
    services therefore always mask (a no-op when every column is
    real)."""
    import seekr_tpu.utils.aot as aot_mod

    calls = []
    real = aot_mod.aot_call

    def spy(fn, args, static=None):
        if static and "mask_cols" in static:
            calls.append(dict(static))
        return real(fn, args, static)

    monkeypatch.setattr(aot_mod, "aot_call", spy)
    tmp, _ = artifacts
    rng = np.random.default_rng(53)
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"), grow_quantum=8)
    assert int(svc._targets_std.shape[0]) == 8  # 6 targets padded to 8
    queries = _seqs(rng, 2)
    svc.query(queries, want=("topk",), topk=4)
    svc.add_targets(_seqs(rng, 2))  # 6 -> 8: exact fill, in-place
    assert svc._n_targets == 8
    assert int(svc._targets_std.shape[0]) == 8
    out = svc.query(queries, want=("topk",), topk=4)
    assert len(calls) == 2
    assert calls[0] == calls[1], \
        f"static top-k key changed across an in-place grow: {calls}"
    assert calls[0]["mask_cols"] is True
    assert np.asarray(out["topk_idx"]).max() < 8  # grown rows selectable


def test_corpus_budget_env_parsing(artifacts, monkeypatch):
    """SEEKR_TPU_CORPUS_BUDGET: '0' disables the cap (the conventional
    unlimited sentinel), integers are bytes, and junk raises an error
    naming the variable instead of a bare int() ValueError (review
    finding)."""
    tmp, _ = artifacts

    monkeypatch.setenv("SEEKR_TPU_CORPUS_BUDGET", "0")
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"), grow_quantum=8)
    assert svc.mem_budget_bytes is None  # 0 = no cap, growth unbounded

    monkeypatch.setenv("SEEKR_TPU_CORPUS_BUDGET", "4096")
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"), grow_quantum=8)
    assert svc.mem_budget_bytes == 4096

    monkeypatch.setenv("SEEKR_TPU_CORPUS_BUDGET", "4G")
    with pytest.raises(ValueError, match="SEEKR_TPU_CORPUS_BUDGET"):
        SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                     targets=str(tmp / "targets.fa"), grow_quantum=8)


def test_warmup_can_raise_coalesce_cap(artifacts):
    """A later warmup(max_batch=N) with larger N RAISES the coalesce cap
    (review finding: min() made the documented knob a no-op after the
    first warmup), while the first warmup still tightens it from the
    pre-warmup default."""
    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                       targets=str(tmp / "targets.fa"))
    assert svc.max_coalesce_rows == 512  # pre-warmup hard default
    svc.warmup(lengths=(64,), max_batch=2, topk=0)
    assert svc.max_coalesce_rows == 2
    svc.warmup(lengths=(64,), max_batch=4, topk=0)
    assert svc.max_coalesce_rows == 4  # raised, not min()'d to 2
    svc.warmup(lengths=(64,), max_batch=2, topk=0)
    assert svc.max_coalesce_rows == 4  # largest EVER warmed wins


def test_serve_single_bucket_policy(artifacts):
    """The serving counter forces ONE length bucket at the power-of-two
    batch max: every query batch lands on the warmup shape grid instead
    of minting a novel assemble shape per length mix (compiled-shape
    reuse beats count FLOPs for a latency-bound path).  The padded
    counts must be bitwise the bucketed-policy counts (integer window
    sums are exact in f32, so tiling cannot move them).
    """
    from seekr_tpu.io.encode import encode_seqs, pick_bucket_length

    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K)
    rng = np.random.default_rng(5)
    mixed = _seqs(rng, 9, lo=60, hi=900)  # spans several default buckets

    counter = svc._seq_counter(mixed)
    expect_floor = pick_bucket_length(max(len(s) for s in mixed), K)
    assert counter.min_bucket_len == expect_floor
    enc = encode_seqs(mixed, K, min_bucket_len=expect_floor)
    assert len(enc.buckets) == 1

    single = np.asarray(counter._raw_counts_device())
    from seekr_tpu.models.counter import KmerCounter

    bucketed = KmerCounter(None, k=K, mean=False, std=False,
                           log2="Log2.none", silent=True)
    bucketed.seqs = list(mixed)
    np.testing.assert_array_equal(single,
                                  np.asarray(bucketed._raw_counts_device()))


def test_serve_fresh_length_mixes_share_shapes(artifacts):
    """Distinct random length mixes of the same batch size produce the
    SAME encoded device shapes (the whole point of the serving bucket
    policy — a novel mix must not imply a novel executable)."""
    from seekr_tpu.io.encode import encode_seqs

    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K)
    rng = np.random.default_rng(6)
    shapes = set()
    for _ in range(4):
        batch = svc._pad_batch(_seqs(rng, 7, lo=300, hi=1000))
        c = svc._seq_counter(batch)
        enc = encode_seqs(batch, K, min_bucket_len=c.min_bucket_len)
        shapes.add(tuple(b[0].shape for b in enc.buckets))
    assert len(shapes) == 1, shapes


def test_bulk_loads_keep_bucketed_encode(artifacts):
    """Batches past the single-bucket row cap (corpus loads, bulk
    add_targets) keep the throughput-oriented bucketed encode — padding
    thousands of rows to the corpus max would multiply host encode and
    upload bytes for a compile space nobody re-enters."""
    from seekr_tpu.serve import _SINGLE_BUCKET_MAX_ROWS

    tmp, _ = artifacts
    svc = SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K)
    rng = np.random.default_rng(9)
    bulk = _seqs(rng, _SINGLE_BUCKET_MAX_ROWS + 1, lo=60, hi=900)
    assert svc._seq_counter(bulk).min_bucket_len == 256  # default floor
    small = bulk[:8]
    assert svc._seq_counter(small).min_bucket_len > 256
