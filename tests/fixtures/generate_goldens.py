"""Generate the committed goldens by running the REFERENCE implementation.

Provenance (VERDICT r4 next-round #3): the .npy/.csv files next to the
authored fastas are the OUTPUT of the reference package (mounted
read-only at /root/reference) run on tests/fixtures/data/example.fa via
the same console-shim recipes its own test suite uses
(seekr/tests/test_console_scripts.py:34-124):

  example_2mers_counts.npy  _run_kmer_counts k=2 binary centered
                            standardized Log2.post remove_labels
  example_3mers_raw.csv     _run_kmer_counts k=3 csv uncentered
                            unstandardized Log2.none remove_labels
  example_mean.npy          _run_norm_vectors k=2 Log2.none
  example_std.npy           _run_norm_vectors k=2 Log2.none
  example_2mers_count.npy   _run_kmer_counts k=2 binary uncentered
                            unstandardized Log2.post remove_labels
                            -mv example_mean.npy -sv example_std.npy
  example_2mers.csv         BasicCounter k=2 csv centered standardized
                            Log2.post labeled (the labeled-CSV artifact)

No reference file is copied — these are artifacts COMPUTED by reference
code on this repo's own authored sequences, committed so the parity
assertions (tests/test_parity_golden.py etc.) hold in a bare clone with
no reference mount.  Rerun after changing make_fixtures.py:

  python tests/fixtures/make_fixtures.py
  python tests/fixtures/generate_goldens.py   (needs /root/reference)
"""

from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data")
REFERENCE = "/root/reference"


def main():
    if not os.path.isdir(REFERENCE):
        raise SystemExit("generate_goldens.py needs the reference mounted "
                         f"at {REFERENCE}")
    # the reference's console_scripts imports adj_pval -> statsmodels at
    # module level; statsmodels is not installed here, and nothing below
    # touches it — reuse the documented shim from the chain baseline
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_chain_baseline",
        os.path.join(os.path.dirname(HERE), "..", "exp",
                     "ref_chain_baseline.py"))
    rcb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rcb)
    import tempfile
    rcb.install_statsmodels_shim(tempfile.mkdtemp(prefix="seekr_shim_"))
    # console_scripts also imports kmer_leiden -> igraph/leidenalg at
    # module level; neither is installed nor used by the count recipes
    # below — satisfy the imports with empty stub modules
    import types
    for name in ("igraph", "leidenalg"):
        sys.modules.setdefault(name, types.ModuleType(name))

    sys.path.insert(0, REFERENCE)
    from seekr import console_scripts
    from seekr.kmer_counts import BasicCounter

    fa = os.path.join(DATA, "example.fa")

    out = os.path.join(DATA, "example_2mers_counts.npy")
    console_scripts._run_kmer_counts(
        fasta=fa, outfile=out, kmer=2, binary=True, centered=True,
        standardized=True, log2="Log2.post", remove_labels=True,
        mean_vector=None, std_vector=None, alphabet="AGTC")
    print("wrote", out, np.load(out).shape)

    out = os.path.join(DATA, "example_3mers_raw.csv")
    console_scripts._run_kmer_counts(
        fasta=fa, outfile=out, kmer=3, binary=False, centered=False,
        standardized=False, log2="Log2.none", remove_labels=True,
        mean_vector=None, std_vector=None, alphabet="AGTC")
    print("wrote", out)

    mean = os.path.join(DATA, "example_mean.npy")
    std = os.path.join(DATA, "example_std.npy")
    console_scripts._run_norm_vectors(
        fasta=fa, mean_vector=mean, std_vector=std, log2="Log2.none",
        kmer=2)
    print("wrote", mean, "and", std)

    out = os.path.join(DATA, "example_2mers_count.npy")
    console_scripts._run_kmer_counts(
        fasta=fa, outfile=out, kmer=2, binary=True, centered=False,
        standardized=False, log2="Log2.post", remove_labels=True,
        mean_vector=mean, std_vector=std, alphabet="AGTC")
    print("wrote", out, np.load(out).shape)

    out = os.path.join(DATA, "example_2mers.csv")
    counter = BasicCounter(fa, outfile=out, k=2, binary=False, mean=True,
                           std=True, log2="Log2.post", label=True)
    counter.make_count_file()
    print("wrote", out)


if __name__ == "__main__":
    sys.exit(main())
