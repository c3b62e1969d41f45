"""k-mer-preserving shuffle generator (legacy seekr_gen_rand_rnas surface).

Behavioral contract from the reference's shipped legacy tests
(/root/reference/seekr/tests/test_fasta.py:44-120): k-mer multisets are
preserved exactly, mutations inject point substitutions, group mode
shuffles the pooled concatenation and splits it back.
"""

import numpy as np
import pytest

from seekr_tpu.data.rand_rnas import RandomMaker, gen_rand_rnas


def _kmer_counts(seq, k):
    out = {}
    for i in range(len(seq) - k + 1):
        w = seq[i:i + k]
        out[w] = out.get(w, 0) + 1
    return out


def _random_seq(rng, n):
    return "".join(rng.choice(list("AGTC"), size=n))


@pytest.mark.parametrize("k", [2, 3, 4])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kmer_multiset_preserved_exactly(k, seed):
    rng = np.random.default_rng(seed)
    seq = _random_seq(rng, 400)
    out = RandomMaker(k=k, seed=seed).shuffle(seq)
    assert len(out) == len(seq)
    assert _kmer_counts(out, k) == _kmer_counts(seq, k)


@pytest.mark.parametrize("k", [2, 3])
def test_endpoints_preserved(k):
    rng = np.random.default_rng(7)
    seq = _random_seq(rng, 300)
    out = RandomMaker(k=k, seed=5).shuffle(seq)
    assert out[:k - 1] == seq[:k - 1]
    assert out[-(k - 1):] == seq[-(k - 1):]


def test_k1_composition_preserved_and_shuffled():
    rng = np.random.default_rng(3)
    seq = _random_seq(rng, 500)
    out = RandomMaker(k=1, seed=3).shuffle(seq)
    assert sorted(out) == sorted(seq)
    assert out != seq  # astronomically unlikely to be identity


def test_shuffle_changes_long_sequences():
    rng = np.random.default_rng(11)
    seq = _random_seq(rng, 600)
    out = RandomMaker(k=2, seed=11).shuffle(seq)
    assert out != seq


def test_seed_determinism():
    rng = np.random.default_rng(9)
    seq = _random_seq(rng, 200)
    a = RandomMaker(k=2, seed=42).shuffle(seq)
    b = RandomMaker(k=2, seed=42).shuffle(seq)
    c = RandomMaker(k=2, seed=43).shuffle(seq)
    assert a == b
    assert a != c or seq == a  # different seed, different walk (w.h.p.)


def test_short_sequences_returned_unchanged():
    maker = RandomMaker(k=3, seed=0)
    assert maker.shuffle("AG") == "AG"
    assert maker.shuffle("AGT") == "AGT"  # len == k: single k-mer


def test_single_euler_walk_is_identity():
    # every vertex has one distinct successor -> the walk is forced
    assert RandomMaker(k=2, seed=0).shuffle("AGAGAGAG") == "AGAGAGAG"


def test_mutations_hamming_distance_exact():
    maker = RandomMaker(k=1, seed=1, mutations=3)
    seq = "A" * 50
    out = maker.shuffle(seq)
    assert len(out) == 50
    assert sum(a != b for a, b in zip(seq, out)) == 3


def test_mutations_capped_at_length():
    maker = RandomMaker(k=1, seed=1, mutations=99)
    out = maker.shuffle("AAAA")
    assert len(out) == 4
    assert all(c != "A" for c in out)


def test_ambiguous_bases_are_preserved_tokens():
    seq = "AGTNNCAGTNAC"
    out = RandomMaker(k=2, seed=4).shuffle(seq)
    assert _kmer_counts(out, 2) == _kmer_counts(seq, 2)


def test_split_restores_stored_lengths():
    # legacy contract: split() cuts a pooled string back to the stored
    # sequences' lengths (test_fasta.py:91-100)
    maker = RandomMaker(k=2, seed=1)
    maker.seqs = ["this sentence is 35 characters long", "this one is 14"]
    pooled = "TCATTAAGCGCGTCGGTCTCTGTGTACGTCATCTCCATTTTTTTTCGTG"
    parts = maker.split(pooled)
    assert [len(p) for p in parts] == [35, 14]
    assert "".join(parts) == pooled


def test_inject_seqs_interleaves_headers():
    maker = RandomMaker()
    maker.names = [">seq1", ">seq2"]
    assert maker.inject_seqs(["this is new", "also new"]) == \
        [">seq1", "this is new", ">seq2", "also new"]


def _write_fasta(path, seqs):
    with open(path, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">SEQ{i + 1}\n{s}\n")


def test_synthesize_random_preserves_headers_and_kmers(tmp_path):
    rng = np.random.default_rng(6)
    seqs = [_random_seq(rng, n) for n in (80, 120, 60)]
    infa, outfa = tmp_path / "in.fa", tmp_path / "out.fa"
    _write_fasta(infa, seqs)
    gen_rand_rnas(str(infa), str(outfa), k=2, seed=0)
    from seekr_tpu.io.fasta import Reader

    reader = Reader(str(outfa))
    assert reader.get_headers() == [">SEQ1", ">SEQ2", ">SEQ3"]
    for orig, new in zip(seqs, reader.get_seqs()):
        assert _kmer_counts(new, 2) == _kmer_counts(orig, 2)


def test_group_mode_preserves_pooled_kmers_and_lengths(tmp_path):
    rng = np.random.default_rng(8)
    seqs = [_random_seq(rng, n) for n in (90, 40, 150)]
    infa, outfa = tmp_path / "in.fa", tmp_path / "out.fa"
    _write_fasta(infa, seqs)
    gen_rand_rnas(str(infa), str(outfa), k=2, seed=1, group=True)
    from seekr_tpu.io.fasta import Reader

    new_seqs = Reader(str(outfa)).get_seqs()
    assert [len(s) for s in new_seqs] == [len(s) for s in seqs]
    assert _kmer_counts("".join(new_seqs), 2) == \
        _kmer_counts("".join(seqs), 2)


def test_cli_shim_and_console(tmp_path):
    from seekr_tpu.cli import _run_gen_rand_rnas, console_gen_rand_rnas

    rng = np.random.default_rng(12)
    seqs = [_random_seq(rng, 70)]
    infa = tmp_path / "in.fa"
    _write_fasta(infa, seqs)

    out1 = tmp_path / "o1.fa"
    # legacy shim signature passes strings (test_console_scripts.py:155-163)
    _run_gen_rand_rnas(str(infa), str(out1), "2", "5", "1", False)
    out2 = tmp_path / "o2.fa"
    console_gen_rand_rnas([str(infa), str(out2), "-k", "2", "-m", "5",
                           "-s", "1"])
    assert out1.read_text() == out2.read_text()
    from seekr_tpu.io.fasta import Reader

    new = Reader(str(out1)).get_seqs()[0]
    assert len(new) == 70
