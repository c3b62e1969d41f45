"""Streamed pval chain (VERDICT r3 weak #1 / next-round item 1).

find_pval's streamed mode (tile-wise device Pearson -> cdf -> append)
must produce byte-identical artifacts to the in-memory path; the
[m1, m2] matrix must never be materialized.
"""

import numpy as np
import pytest

from seekr_tpu.stats.find_pval import find_pval

K = 2
DIGIT2CHAR = np.array(list("AGTC"))


def _write_fasta(path, seqs, prefix="s"):
    path.write_text("".join(f">{prefix}{i}\n{s}\n"
                            for i, s in enumerate(seqs)))


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream_pval")
    rng = np.random.default_rng(0)
    mk = lambda n, lo, hi: ["".join(DIGIT2CHAR[rng.integers(0, 4, size=int(
        rng.integers(lo, hi)))]) for _ in range(n)]
    _write_fasta(tmp / "a.fa", mk(7, 50, 150), "a")
    _write_fasta(tmp / "b.fa", mk(5, 50, 150), "b")
    np.save(tmp / "mean.npy", rng.uniform(0.5, 2.0, 4 ** K))
    np.save(tmp / "std.npy", rng.uniform(0.5, 2.0, 4 ** K))
    return tmp


FITRES = [("norm", 0.02, (0.0, 0.3))]


def _run(tmp, out, **kw):
    return find_pval(str(tmp / "a.fa"), str(tmp / "b.fa"),
                     str(tmp / "mean.npy"), str(tmp / "std.npy"), K,
                     kw.pop("fitres", FITRES), outputname=out, **kw)


@pytest.mark.parametrize("fitres", [FITRES,
                                    np.random.default_rng(1).normal(
                                        0, 0.3, 2000)],
                         ids=["fitted", "empirical"])
def test_streamed_csv_bytes_match_in_memory(chain, tmp_path, fitres):
    mem_df = _run(chain, str(tmp_path / "mem"), fitres=fitres)
    assert mem_df is not None and mem_df.shape == (7, 5)
    got = _run(chain, str(tmp_path / "st"), fitres=fitres, stream=True)
    assert got is None  # streamed mode returns None by contract
    mem = (tmp_path / "mem.csv").read_bytes()
    st = (tmp_path / "st.csv").read_bytes()
    assert mem == st


def test_streamed_small_tiles_match_values(chain, tmp_path):
    """Forced 2-row device tiles: tile boundaries must not change the
    emitted values beyond the GEMM's own retiling (ulp-level on real
    TPU hardware, where the bf16x3 GEMM reassociates per tile shape;
    none at this size on the CPU backend) — the repo's standard Pearson
    tolerance applies."""
    mem_df = _run(chain, str(tmp_path / "mem"))
    _run(chain, str(tmp_path / "st"), stream=True, stream_block_rows=2,
         npy_out=str(tmp_path / "st.npy"))
    arr = np.load(tmp_path / "st.npy")
    assert arr.dtype == np.float32
    np.testing.assert_allclose(arr, mem_df.to_numpy(), rtol=1e-4, atol=1e-6)


def test_streamed_npy_matches_in_memory_bytes(chain, tmp_path):
    mem_df = _run(chain, None, npy_out=str(tmp_path / "mem.npy"))
    _run(chain, None, npy_out=str(tmp_path / "st.npy"), stream=True)
    a, b = np.load(tmp_path / "mem.npy"), np.load(tmp_path / "st.npy")
    assert a.dtype == b.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, mem_df.to_numpy())


def test_auto_threshold_streams_large(chain, tmp_path, monkeypatch):
    """Above STREAM_CELL_THRESHOLD with an output path, streaming kicks
    in automatically (and without any output path it cannot)."""
    import seekr_tpu.stats.find_pval as fp

    monkeypatch.setattr("seekr_tpu.io.stream.STREAM_CELL_THRESHOLD", 10)
    got = _run(chain, str(tmp_path / "auto"))
    assert got is None
    assert (tmp_path / "auto.csv").exists()
    # no artifact requested -> nothing to stream into: in-memory DataFrame
    got = _run(chain, None)
    assert got is not None and got.shape == (7, 5)
    # hard override wins over the threshold
    got = _run(chain, str(tmp_path / "off"), stream=False)
    assert got is not None


def test_invalid_fitres_still_rejected_before_compute(chain, capsys):
    assert _run(chain, None, fitres=[("norm", "bad", "params")]) is None
    assert "format of fitres is wrong" in capsys.readouterr().out
    assert _run(chain, None, fitres=FITRES, bestfit=7) is None
    assert "bestfit must be between" in capsys.readouterr().out
    assert _run(chain, None, fitres=np.zeros((2, 2))) is None
    assert "1D numpy array" in capsys.readouterr().out
    assert _run(chain, None, fitres="nonsense") is None
    assert "either a list" in capsys.readouterr().out


def test_cli_stream_flags(chain, tmp_path, monkeypatch):
    """The CLI extension flags reach find_pval (csv+npy both written)."""
    import pandas as pd

    from seekr_tpu.cli import console_find_pval

    fit = pd.DataFrame([("norm", 0.02, str((0.0, 0.3)))],
                       columns=["dist", "D", "params"])
    fit.to_csv(tmp_path / "fitres.csv", index=False)
    monkeypatch.chdir(tmp_path)
    console_find_pval([str(chain / "a.fa"), str(chain / "b.fa"),
                       str(chain / "mean.npy"), str(chain / "std.npy"),
                       str(K), str(tmp_path / "fitres.csv"),
                       "-o", "out", "--stream", "on",
                       "-bo", "out.npy"])
    assert (tmp_path / "out.csv").exists()
    arr = np.load(tmp_path / "out.npy")
    assert arr.shape == (7, 5) and arr.dtype == np.float32


@pytest.mark.parametrize("stream", [False, True], ids=["inmem", "stream"])
def test_data_parallel_matches_single_device(chain, tmp_path, stream):
    """-dp N: the Pearson runs data-sharded (stream_pearson_sharded);
    values match the single-device path within GEMM-retiling ulp, in
    both the in-memory and streamed modes."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices (8-device virtual CPU mesh in the "
                    "default test config; the real-TPU session has 1)")
    single = _run(chain, None, npy_out=str(tmp_path / "s.npy"),
                  stream=stream)
    sharded = _run(chain, None, npy_out=str(tmp_path / "m.npy"),
                   stream=stream, data_parallel=4)
    if stream:
        assert single is None and sharded is None
    else:
        np.testing.assert_allclose(sharded.to_numpy(), single.to_numpy(),
                                   rtol=1e-5, atol=1e-7)
    a, b = np.load(tmp_path / "s.npy"), np.load(tmp_path / "m.npy")
    assert a.shape == b.shape == (7, 5)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7)


def test_forced_stream_without_sink_is_rejected(chain):
    """stream=True with no artifact path must raise up front, not run
    the whole computation into zero sinks (review finding)."""
    with pytest.raises(ValueError, match="artifacts only"):
        _run(chain, None, stream=True)
