"""One-shot end-to-end workflow: background -> counts -> Pearson -> p-values.

The reference workflow is five console invocations communicating through CSV
files on disk (norm_vectors -> kmer_counts x2 -> pearson -> find_dist ->
find_pval -> adj_pval).  This module runs the same chain as one in-memory
program: every device stage feeds the next without a host round-trip, and
artifacts are written once at the end.  It is an extension — the individual
reference-compatible commands still exist for drop-in use.

Stages (device unless noted):
  1. background fasta -> norm vectors (mean/std of counts/kb)
  2. background self-Pearson upper triangle = empirical null sample
  3. query fastas -> normalized counts (background mean/std)
  4. query1 x query2 Pearson
  5. empirical p-values (sorted background + searchsorted; float64, host)
  6. multiple-test correction (host)
"""

from __future__ import annotations

import os

import numpy as np

from seekr_tpu.models.counter import KmerCounter
from seekr_tpu.models.pearson import pearson
from seekr_tpu.ops.ecdf import empirical_pvals
from seekr_tpu.ops.pearson import pearson_blocked
from seekr_tpu.stats.adj_pval import adj_pval
from seekr_tpu.utils.adj import triu_values
from seekr_tpu.utils.logging import stage_timer


def _build_mesh(data_parallel, kmer_parallel, coordinator, num_processes,
                process_id):
    """Optional mesh construction for the multi-device workflow path."""
    from seekr_tpu.parallel.mesh import build_mesh_from_flags

    return build_mesh_from_flags(data_parallel, kmer_parallel,
                                 coordinator=coordinator,
                                 num_processes=num_processes,
                                 process_id=process_id)


def run_workflow(seq1file, seq2file=None, background=None, k=6,
                 log2="Log2.post", adj_method="fdr_bh", alpha=0.05,
                 outdir="seekr_out", subset_size=100_000, seed=None,
                 leiden=False, leiden_algo="RBERVertexPartition",
                 leiden_cutoff=0.0, leiden_resolution=1.0,
                 data_parallel=None, kmer_parallel=1, coordinator=None,
                 num_processes=None, process_id=None):
    """Full analysis in one call; returns a dict of results.

    seq2file=None compares seq1file against itself.  ``background`` provides
    the normalization vectors and the empirical null distribution (required).
    Artifacts written to ``outdir``: mean/std .npy, counts CSVs, pearson CSV,
    pvals CSV, adjusted pvals CSV.

    ``leiden=True`` appends the community-detection stage of the reference
    chain (seekr_kmer_leiden) on the query self-similarity graph — edges
    where r > ``leiden_cutoff``, native C++ engine, deterministic seed —
    writing ``communities.csv`` (header, community) and returning the
    membership.  Requires a self comparison (seq2file None/equal): the
    rectangular cross-similarity of two different fastas is not a graph.

    Multi-device extension (the reference is strictly single-process):
    ``data_parallel``/``kmer_parallel`` build a device mesh and route the
    O(m^2) Pearson stages through the data-sharded streaming GEMM
    (parallel.dist.stream_pearson_sharded); ``coordinator``/
    ``num_processes``/``process_id`` bootstrap multi-host first
    (parallel.dist.init_distributed).  Counting stays per-host (it is
    row-local and bucket-dispatched); results are identical to the
    single-device run within GEMM reduction-order tolerance.

    Scale note: this convenience wrapper holds the pval/adj matrices in
    memory (interactive scale).  Above ~50k transcripts use the streamed
    CLI chain instead — ``seekr_find_pval --stream -bo pvals.npy`` then
    ``seekr_adj_pval pvals.npy <method> -bi`` (and ``seekr_kmer_leiden
    --stream``) — which never materializes an [m1, m2] matrix
    (BASELINE.md "Extreme-scale pval chain").
    """
    import pandas as pd

    if background is None:
        raise ValueError("a background fasta is required (norm vectors + "
                         "empirical null)")
    seq2file = seq2file or seq1file
    # realpath: './q.fa' vs 'q.fa' (or a symlink) is still a self
    # comparison — string inequality would both recount the same fasta
    # and wrongly skip a requested leiden stage
    if os.path.realpath(seq2file) == os.path.realpath(seq1file):
        seq2file = seq1file
    if leiden:
        # validate BEFORE the expensive stages: a typo'd algorithm name
        # must not surface after hours of counting/Pearson with every
        # artifact unwritten
        from seekr_tpu import native

        if leiden_algo not in native.ALGORITHMS:
            raise ValueError(
                f"leiden_algo must be one of {list(native.ALGORITHMS)}, "
                f"got {leiden_algo!r}")
    mesh = _build_mesh(data_parallel, kmer_parallel, coordinator,
                       num_processes, process_id)
    # in a multi-host run every process computes (collectives require it)
    # but only process 0 writes files — concurrent writers on a shared
    # filesystem would interleave/truncate the artifacts
    if num_processes and num_processes > 1:
        import jax

        is_writer = jax.process_index() == 0
    else:
        is_writer = True
    if is_writer:
        os.makedirs(outdir, exist_ok=True)

    def big_pearson(c1, c2):
        """Self/cross Pearson on the mesh when one is configured.

        Self results are mirrored to exact symmetry (models.pearson's
        canonical-upper contract): the blocked/sharded GEMMs' ~1e-5
        cross-tile retiling differences would otherwise flip the
        downstream adj_pval 5-dp symmetric detector at large m
        (measured at 13k) where the reference's bitwise-symmetric
        np.inner takes the upper-triangle path.
        """
        from seekr_tpu.models.pearson import mirror_upper_inplace

        if mesh is None:
            sim = pearson_blocked(c1, c2) if c1 is c2 else pearson(c1, c2)
        else:
            from seekr_tpu.io.stream import ArrayCollector
            from seekr_tpu.parallel.dist import stream_pearson_sharded

            out = ArrayCollector()
            stream_pearson_sharded(mesh, c1, out,
                                   counts2=None if c2 is c1 else c2)
            sim = out.result()
        if c2 is c1:
            mirror_upper_inplace(sim)
        return sim

    with stage_timer("workflow/background"):
        from seekr_tpu.ops.normalize import normalize_counts

        # the background is parsed and RAW-counted exactly once; the two
        # consumers differ only in the normalization epilogue (a cheap
        # elementwise pass), so re-counting the largest corpus of the
        # run for the null sample would double the stage for nothing
        bkg = KmerCounter(background, k=k, log2=log2, silent=True)
        raw_dev = bkg._raw_counts_device()
        # epilogue 1: mean/std under the requested log2 ordering — only
        # the two [4^k] vectors cross to host
        _, mean_d, std_d = normalize_counts(raw_dev, log2_mode=log2,
                                            mean=True, std=True)
        mean = np.asarray(mean_d)
        std = np.asarray(std_d)
        if is_writer:
            np.save(os.path.join(outdir, f"mean_{k}mers.npy"), mean)
            np.save(os.path.join(outdir, f"std_{k}mers.npy"), std)
        # epilogue 2 (null sample): default Log2.post with the computed
        # vectors — the reference find_dist quirk (see stats/find_dist
        # .py); counts stay on device straight into the Pearson
        bkg_dev, _, _ = normalize_counts(raw_dev, log2_mode="Log2.post",
                                         mean=mean, std=std)
        sim_bkg = big_pearson(bkg_dev, bkg_dev)
        null_sample = triu_values(sim_bkg)
        if len(null_sample) > subset_size:
            rng = np.random.default_rng(seed)
            null_sample = rng.choice(null_sample, size=subset_size,
                                     replace=False)

    with stage_timer("workflow/counts"):
        c1 = KmerCounter(seq1file, mean=mean, std=std, k=k, log2=log2,
                         silent=True)
        # Pearson consumes the device copy; the host copy (needed for the
        # counts CSV artifacts + return dict) is fetched exactly once
        c1_dev = c1.get_counts_device()
        c1.counts = np.asarray(c1_dev)
        headers1 = [h[1:] for h in c1.headers]
        if seq2file == seq1file:
            c2, c2_dev, headers2 = c1, c1_dev, headers1
        else:
            c2 = KmerCounter(seq2file, mean=mean, std=std, k=k, log2=log2,
                             silent=True)
            c2_dev = c2.get_counts_device()
            c2.counts = np.asarray(c2_dev)
            headers2 = [h[1:] for h in c2.headers]

    with stage_timer("workflow/pearson", items=len(headers1) * len(headers2),
                     unit="cells"):
        sim = big_pearson(c1_dev, c2_dev)

    with stage_timer("workflow/pvalues"):
        pvals = np.asarray(empirical_pvals(null_sample, sim),
                           dtype=sim.dtype)
        pval_df = pd.DataFrame(pvals, index=headers1, columns=headers2)
        adj_df = adj_pval(pval_df, method=adj_method, alpha=alpha)

    membership = None
    if leiden:
        if c2 is not c1:
            print("leiden stage skipped: community detection needs a self "
                  "comparison (omit seq2file), not a cross-similarity of "
                  "two fastas.")
        else:
            with stage_timer("workflow/leiden", items=len(headers1),
                             unit="nodes"):
                gmat = np.array(sim, dtype=np.float64)  # one copy, writable
                # same threshold semantics as kmer_leiden (r < cutoff -> 0,
                # diagonal -> 0; edges are the remaining r > 0 cells)
                gmat[gmat < leiden_cutoff] = 0.0
                np.fill_diagonal(gmat, 0.0)
                gdf = pd.DataFrame(gmat, index=headers1, columns=headers1)
                from seekr_tpu.graph.kmer_leiden import leiden_membership

                membership = leiden_membership(gdf, algo=leiden_algo,
                                               rs=leiden_resolution,
                                               setseed=True)

    with stage_timer("workflow/artifacts"):
        if is_writer:
            from seekr_tpu.io.fast_csv import write_labeled_csv

            write_labeled_csv(os.path.join(outdir, "counts1.csv"),
                              c1.counts, headers1, c1.kmers)
            if c2 is not c1:
                write_labeled_csv(os.path.join(outdir, "counts2.csv"),
                                  c2.counts, headers2, c2.kmers)
            write_labeled_csv(os.path.join(outdir, "pearson.csv"),
                              sim, headers1, headers2)
            pval_df.to_csv(os.path.join(outdir, "pvals.csv"))
            if adj_df is not None:
                adj_df.to_csv(os.path.join(outdir, "pvals_adjusted.csv"))
            if membership is not None:
                # pandas handles CSV quoting of comma/quote-bearing headers
                pd.DataFrame({"Id": headers1,
                              "Community": membership}).to_csv(
                    os.path.join(outdir, "communities.csv"), index=False)

    return {
        "mean": mean, "std": std, "null_sample": null_sample,
        "counts1": c1.counts, "counts2": c2.counts, "pearson": sim,
        "pvals": pval_df, "pvals_adjusted": adj_df,
        "communities": membership,
    }
