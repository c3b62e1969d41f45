"""Reference-layout import aliases: `s/seekr/seekr_tpu/` must just work.

A reference user's imports (`from seekr.kmer_counts import BasicCounter`,
`from seekr.pearson import pearson`, ...) map onto thin alias modules at
the package root.  Where the reference module name doubles as the
package-root FUNCTION export (`from seekr_tpu import pearson`), the alias
module is made callable so both idioms coexist in one process regardless
of import order.
"""

import importlib

import numpy as np
import pytest

# (module, public names) — mirrors /root/reference/seekr/*.py surfaces
SURFACE = {
    "seekr_tpu.fasta": ["Downloader"],
    "seekr_tpu.fasta_reader": ["Reader"],
    "seekr_tpu.kmer_counts": ["BasicCounter", "Log2"],
    "seekr_tpu.pearson": ["pearson"],
    "seekr_tpu.find_dist": ["find_dist"],
    "seekr_tpu.find_pval": ["find_pval", "is_float_type",
                            "check_tuple_format", "check_main_list"],
    "seekr_tpu.adj_pval": ["adj_pval", "is_symmetric"],
    "seekr_tpu.filter_gencode": ["filter_gencode"],
    "seekr_tpu.kmer_heatmap": ["kmer_heatmap", "is_hex_color",
                               "check_hex_colors"],
    "seekr_tpu.kmer_dendrogram": ["kmer_dendrogram"],
    "seekr_tpu.kmer_count_barplot": ["kmer_count_barplot"],
    "seekr_tpu.kmer_msd_barplot": ["kmer_msd_barplot"],
    "seekr_tpu.kmer_comp_textplot": ["kmer_comp_textplot",
                                     "find_word_coordinates", "ass_color"],
    "seekr_tpu.kmer_indi_textplot": ["kmer_indi_textplot",
                                     "find_word_coordinates", "ass_color"],
    "seekr_tpu.kmer_leiden": ["kmer_leiden"],
    "seekr_tpu.my_tqdm": ["my_tqdm", "my_trange"],
}


@pytest.mark.parametrize("module,names", sorted(SURFACE.items()))
def test_alias_module_surface(module, names):
    mod = importlib.import_module(module)
    for name in names:
        assert getattr(mod, name, None) is not None, (module, name)


def test_aliases_are_the_canonical_objects():
    from seekr_tpu.kmer_counts import BasicCounter as aliased
    from seekr_tpu.models.counter import BasicCounter as canonical

    assert aliased is canonical


def test_function_and_module_idioms_coexist(tmp_path):
    # import the MODULE first (rebinds the package-root attribute), then
    # use the function idiom — the callable module keeps it working
    import seekr_tpu.pearson  # noqa: F401  (rebinds seekr_tpu.pearson)
    import seekr_tpu

    fn = seekr_tpu.pearson  # now the module object — must stay callable
    a = np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32)
    out = np.asarray(fn(a, a))
    from seekr_tpu.models.pearson import pearson as canonical

    np.testing.assert_allclose(out, np.asarray(canonical(a, a)),
                               rtol=1e-6, atol=1e-6)


def test_reference_style_end_to_end(tmp_path):
    # the reference README idiom, with only the package name swapped
    from seekr_tpu.kmer_counts import BasicCounter
    from seekr_tpu.pearson import pearson

    fa = tmp_path / "x.fa"
    rng = np.random.default_rng(5)
    letters = np.array(list("AGTC"))
    recs = []
    for i in range(5):
        recs.append(f">r{i}")
        recs.append("".join(letters[rng.integers(0, 4, size=120)]))
    fa.write_text("\n".join(recs) + "\n")

    c = BasicCounter(str(fa), k=3, mean=False, std=False,
                     log2="Log2.none", silent=True)
    c.get_counts()
    sim = np.asarray(pearson(c.counts, c.counts))
    assert sim.shape == (5, 5)
    # the package's documented Pearson budget: bf16x3 HIGH-precision GEMM
    # is within 1.3e-5 of the f64 oracle on TPU (BASELINE.md precision
    # sweep) — 1e-4 is the parity budget every pearson test asserts at
    np.testing.assert_allclose(np.diag(sim), 1.0, rtol=1e-4)


def test_models_pearson_module_and_function_both_usable():
    """`import seekr_tpu.models.pearson` must yield a usable module even
    after the models package exports the FUNCTION of the same name
    (review finding: the eager from-import shadowed the submodule)."""
    import numpy as np

    import seekr_tpu.models.pearson as mp

    c = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
    a = np.asarray(mp.pearson(c, c))      # module attribute
    b = np.asarray(mp(c, c))              # callable module
    np.testing.assert_array_equal(a, b)
    from seekr_tpu.models import pearson as f
    np.testing.assert_array_equal(np.asarray(f(c, c)), a)


def test_package_root_is_jax_free():
    """`import seekr_tpu` must not pull jax: every console entry point
    imports the package root, and the pure host commands must not pay
    the device-init import (review finding)."""
    import subprocess
    import sys

    code = (
        "import sys\n"
        "assert 'jax' not in sys.modules, 'jax preloaded (env)'\n"
        "import seekr_tpu\n"
        "assert 'jax' not in sys.modules, 'package root imported jax'\n"
        "print('ok')\n"
    )
    env = {"PATH": "/usr/bin:/bin", "PYTHONPATH": ""}
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True,
                          cwd="/root/repo", timeout=120)
    assert proc.returncode == 0 and "ok" in proc.stdout, proc.stderr
