"""Author the in-repo test fastas (VERDICT r4 next-round #3).

These files are ORIGINAL, deterministically generated sequences — nothing
is copied from the reference repo.  They mirror only the STRUCTURE its
test corpus has (file names, sequence counts, header schemes, length
profiles) so the test-suite's parity net can run in a bare clone:

  data/example.fa     5 seqs  >SEQ1..>SEQ5, lengths 6..76 (toy corpus)
  data/example2.fa    4 seqs  GENCODE-style pipe headers (len at [-2])
  data/v22_pc_head.fa 5 seqs  versioned GENCODE pc-style headers
  ldseq.fa            21 seqs ~317-534 nt (graph/viz corpus)
  seqs1.fa            111 seqs ~292-669 nt (background corpus)
  seqs2.fa            151 seqs ~243-661 nt (query corpus)

Sequences are drawn with per-family dinucleotide-composition biases so
the k-mer Pearson structure is realistic: ldseq.fa carries three
composition families (communities for Leiden) on a strong shared
backbone, which keeps every pairwise k=2 r comfortably positive — a
property the graph tests rely on (all 210 edges present at the default
cutoff) and which this script ASSERTS before writing anything.

The matching goldens under data/ are produced by generate_goldens.py,
which runs the actual REFERENCE implementation on these files (see
README.md for provenance).

Run: python tests/fixtures/make_fixtures.py   (rewrites the fastas)
"""

from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
LETTERS = np.array(list("AGTC"))


def _seq(rng, length, bias):
    """One sequence from a first-order (dinucleotide) composition bias."""
    probs = bias / bias.sum(axis=1, keepdims=True)
    out = np.empty(length, dtype=np.int64)
    out[0] = rng.choice(4, p=probs.mean(axis=0))
    for i in range(1, length):
        out[i] = rng.choice(4, p=probs[out[i - 1]])
    return "".join(LETTERS[out])


_BACKBONE = None


def _family_bias(rng, strength=0.35):
    """A 4x4 transition bias: shared SKEWED backbone + family deviation.

    The backbone must be non-uniform: with flat composition the expected
    k-mer profile is constant across columns and pairwise Pearson r of
    the count rows collapses to noise around 0.  A strongly skewed
    shared backbone gives every sequence a common profile (all-positive
    r, like real transcriptomes), and the family deviation layered on
    top creates the community structure the graph tests need.
    """
    global _BACKBONE
    if _BACKBONE is None:
        _BACKBONE = rng.dirichlet(np.full(4, 0.7), size=4) * 4.0
    dev = rng.dirichlet(np.ones(4), size=4) * 4.0
    return _BACKBONE * (1 - strength) + dev * strength


def _write(path, records, wrap=0):
    with open(path, "w") as fh:
        for header, seq in records:
            fh.write(header + "\n")
            if wrap:
                for i in range(0, len(seq), wrap):
                    fh.write(seq[i : i + wrap] + "\n")
            else:
                fh.write(seq + "\n")
    rel = os.path.relpath(path, HERE)
    print(f"wrote {rel}: {len(records)} seqs")


def _corpus(rng, n, l_lo, l_hi, n_families, header_fn, strength=0.35):
    biases = [_family_bias(rng, strength) for _ in range(n_families)]
    recs = []
    for i in range(n):
        length = int(rng.integers(l_lo, l_hi + 1))
        seq = _seq(rng, length, biases[i % n_families])
        recs.append((header_fn(i, length), seq))
    return recs


def min_pairwise_r_k2(records):
    """Min off-diagonal Pearson r of the k=2 counts/kb matrix (the
    quantity the Leiden edge-count tests depend on)."""
    rows = []
    for _, seq in records:
        counts = np.zeros(16)
        idx = {c: i for i, c in enumerate("AGTC")}
        for a, b in zip(seq, seq[1:]):
            counts[idx[a] * 4 + idx[b]] += 1
        rows.append(counts * 1000.0 / (len(seq) - 1))
    r = np.corrcoef(np.array(rows))
    return float(np.min(r[~np.eye(len(rows), dtype=bool)]))


def main():
    rng = np.random.default_rng(20260820)
    data = os.path.join(HERE, "data")
    os.makedirs(data, exist_ok=True)

    # -- example.fa: the toy parity corpus ------------------------------
    ex_lengths = [6, 12, 16, 75, 76]
    bias = _family_bias(rng, strength=0.5)
    ex = [(f">SEQ{i + 1}", _seq(rng, n, bias))
          for i, n in enumerate(ex_lengths)]
    _write(os.path.join(data, "example.fa"), ex)

    # -- example2.fa: GENCODE-style pipe headers (len field at [-2]) ----
    def gencode_header(prefix, i, length):
        return (f">ENST{prefix}{i:011d}.1|ENSG{prefix}{i:011d}.1|"
                f"OTTHUMG{i:011d}.1|OTTHUMT{i:011d}.1|"
                f"SYN{i + 1}-001|SYN{i + 1}|{length}|CDS:1-{length}|")

    recs = _corpus(rng, 4, 300, 900, 2,
                   lambda i, n: gencode_header(1, i + 1, n))
    _write(os.path.join(data, "example2.fa"), recs, wrap=60)

    recs = _corpus(rng, 5, 200, 950, 2,
                   lambda i, n: gencode_header(9, i + 1, n))
    _write(os.path.join(data, "v22_pc_head.fa"), recs, wrap=60)

    # -- ldseq.fa: 21-seq graph/viz corpus, 3 composition families ------
    for attempt in range(20):
        recs = _corpus(rng, 21, 317, 534, 3,
                       lambda i, n: f">SynLd{i + 1}_0_{n}", strength=0.3)
        r_min = min_pairwise_r_k2(recs)
        if r_min > 0.25:
            break
    else:
        raise SystemExit("could not draw an all-positive-r ldseq corpus")
    print(f"ldseq min pairwise k=2 r: {r_min:.3f}")
    _write(os.path.join(HERE, "ldseq.fa"), recs)

    # -- seqs1/seqs2: the larger corpora --------------------------------
    recs = _corpus(rng, 111, 292, 669, 4,
                   lambda i, n: f">SynBg{i + 1}_0_{n}")
    _write(os.path.join(HERE, "seqs1.fa"), recs)
    recs = _corpus(rng, 151, 243, 661, 4,
                   lambda i, n: f">SynQ{i + 1}_0_{n}")
    _write(os.path.join(HERE, "seqs2.fa"), recs)


if __name__ == "__main__":
    sys.exit(main())
