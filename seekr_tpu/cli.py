"""Console entry points — 23 commands, TPU-backed.

Covers the reference's full 16-command v2 surface (incl. the ``seekr``
help command) with flag-for-flag parity (seekr/console_scripts.py:
534-1399, command registry setup.py:59-78), six restored legacy 1.x
commands (seekr_domain_pearson, seekr_pwms, seekr_graph,
seekr_visualize_distro, seekr_canonical_gencode, seekr_gen_rand_rnas —
see docs/USAGE.md), and the seekr_tpu_pipeline extension.  Each command
has a testable ``_run_*`` shim, bare invocation prints help
(console_scripts.py:520-525), and the same file contracts hold (counts
CSV/npy, mean/std npy, pearson npy/csv, pval CSV, plot files).

Also usable without installation:  ``python -m seekr_tpu.cli <command> ...``
where <command> is the entry-point name without the ``seekr_`` prefix
(e.g. ``kmer_counts``), or ``help`` for the overview.
"""

from __future__ import annotations

import argparse
import sys

from seekr_tpu.__version__ import __version__

# -- usage docs (abridged; full flag docs come from argparse --help) ---------

DOWNLOAD_GENCODE_DOC = """
Description
-----------
Download transcript fasta (and optionally the matching GTF annotation)
from GENCODE.  The positional 'biotype' selects the sequence set:
'all' (every transcript on the reference chromosomes), 'pc'
(protein-coding only), or 'lncRNA' (long non-coding only).  Without -r
the latest release for the chosen species is discovered automatically;
downloads are gunzipped unless -z is set.

Examples
--------
Latest human lncRNA transcripts, unzipped, into the working directory:
  $ seekr_download_gencode lncRNA

Mouse release M25, keeping the .gz and also fetching the GTF:
  $ seekr_download_gencode lncRNA -s mouse -r M25 -z -g

Custom output paths:
  $ seekr_download_gencode pc -fp pc.fa.gz -gp pc.gtf.gz
"""

FILTER_GENCODE_DOC = """
Description
-----------
Filter a GENCODE-format fasta by any combination of: minimum sequence
length (-len, read from the header's length field), the
Ensembl_canonical GTF tag (-can, needs -gtf), transcript isoform number
(-iso, regex allowed, '0' disables), and exact-duplicate sequence
removal keeping the first occurrence (-rd).  Writes
'{outputname}.fa'; more than 50 transcript ids unmatched against the
GTF triggers a warning.

Examples
--------
Keep canonical transcripts of at least 500 bases and drop duplicates:
  $ seekr_filter_gencode v43_lncRNA.fa -gtf v43.gtf -len 500 -can -rd -o filtered

Keep only '201' isoforms, no GTF needed:
  $ seekr_filter_gencode v43_lncRNA.fa -iso 201 -o iso201
"""

KMER_COUNTS_DOC = """
Description
-----------
Generate the m x 4^k k-mer count matrix of a fasta file: one row per
transcript, columns in AGTC product order, counts per kb of windows,
optionally mean-centered, standardized, and log2-transformed
(Log2.post by default).  On TPU the counting runs as a Pallas MXU
histogram kernel.  Output is a labeled CSV by default; -b switches to
a binary .npy, -rl drops the CSV labels.

Examples
--------
Defaults (k=6, labeled CSV, Log2.post, centered+standardized):
  $ seekr_kmer_counts rnas.fa -o out_counts.csv

Binary output with a smaller k:
  $ seekr_kmer_counts rnas.fa -o out.npy -k 4 -b

Raw counts/kb (no centering, no standardization, no log):
  $ seekr_kmer_counts rnas.fa -o raw.csv -uc -us -l Log2.none

Normalize against precomputed background vectors (seekr_norm_vectors):
  $ seekr_kmer_counts rnas.fa -o out.csv -mv mean.npy -sv std.npy

Notes
-----
With -l Log2.pre the normalization vectors must also come from a
Log2.pre run of seekr_norm_vectors so means/stds match the log domain.
"""

NORM_VECTORS_DOC = """
Description
-----------
Compute the per-k-mer mean and standard-deviation vectors of a
(typically large background) fasta and save them as two .npy files, to
normalize other fastas consistently in seekr_kmer_counts, seekr_find_pval,
seekr_kmer_leiden, and the barplot commands.

Examples
--------
Defaults (k=6, mean.npy / std.npy):
  $ seekr_norm_vectors gencode.fa

Explicit k and output paths:
  $ seekr_norm_vectors gencode.fa -k 5 -mv mean_5mers.npy -sv std_5mers.npy

Log2.pre statistics (for -l Log2.pre counting runs):
  $ seekr_norm_vectors gencode.fa -l Log2.pre
"""

PEARSON_DOC = """
Description
-----------
All-pairs Pearson correlation between the rows of two k-mer count
artifacts: an [m1, n] and an [m2, n] matrix give an [m1, m2] r-matrix.
Inputs/outputs are labeled CSV by default; -bi reads .npy, -bo writes
.npy.  The GEMM runs on device; outputs beyond ~64M cells stream to
disk in row blocks instead of materializing.

Examples
--------
CSV in, CSV out:
  $ seekr_pearson counts1.csv counts2.csv -o pearson.csv

Binary in and out:
  $ seekr_pearson counts1.npy counts2.npy -o pearson.npy -bi -bo
"""

FIND_DIST_DOC = """
Description
-----------
Model the null distribution of pairwise similarities: count a background
fasta, correlate it against itself, take the upper triangle of r-values
(subsampled to -sbs values when -sbt is set), and fit candidate scipy
distributions ranked by goodness of fit (-statm ks/mse/aic/bic).  Saves
bkg_mean_{k}mers.npy / bkg_std_{k}mers.npy as a side effect.  With -fm
omitted the raw (subsampled) r-values are returned/saved instead — the
empirical background for seekr_find_pval.

Examples
--------
Fit the common 10 distributions and save the ranked results:
  $ seekr_find_dist background.fa -k 4 -fm -statm ks -o fitres

Fit every scipy distribution, 8 host processes, plot the best fits:
  $ seekr_find_dist background.fa -k 4 -fm -mdl all -pb -pf fitplot -nj 8

Raw empirical r-values (no fitting), subsampled to 100k:
  $ seekr_find_dist background.fa -k 4 -sbt -o bkg_rvalues

Notes
-----
Backgrounds past ~31k transcripts switch the subsample to bounded-memory
index sampling (only the sampled pairs are ever computed on device).
"""

FIND_PVAL_DOC = """
Description
-----------
P-values for the pairwise similarities of two fastas: counts both with
the given background mean/std vectors, correlates them, then converts
each r to p against the background model — either the fitted
distribution ranked -bf best in a seekr_find_dist fitres file
(p = 1 - cdf(r)) or an empirical r-value sample (exceedance fraction,
computed on device via searchsorted).  Output is a labeled CSV of
sequence1 x sequence2 p-values.

Examples
--------
Fitted background (fitres from seekr_find_dist -fm):
  $ seekr_find_pval a.fa b.fa mean_4.npy std_4.npy 4 fitres.csv -o pvals

Empirical background (raw r-value csv from seekr_find_dist without -fm):
  $ seekr_find_pval a.fa b.fa mean_4.npy std_4.npy 4 bkg_rvalues.csv -ft npy -o pvals
  (-ft npy marks the fitres artifact as raw numbers, not fitted tuples)

Use the 2nd-best fitted distribution instead of the best:
  $ seekr_find_pval a.fa b.fa mean_4.npy std_4.npy 4 fitres.csv -bf 2

Extreme scale (extension): above 64M output cells the matrix is
streamed tile-by-tile into the artifacts (nothing is held in memory or
returned); -bo also writes a float32 .npy for seekr_adj_pval -bi:
  $ seekr_find_pval big.fa big.fa mean.npy std.npy 6 fitres.csv \\
        -o pvals -bo pvals.npy --stream on
"""

ADJ_PVAL_DOC = """
Description
-----------
Multiple-comparison correction of a seekr_find_pval matrix.  Symmetric
inputs (same fasta vs itself, detected at 5-decimal precision) correct
only the upper triangle and fill the rest with NaN; asymmetric inputs
correct the full flattened matrix.  All ten statsmodels method names
are supported (bonferroni, sidak, holm, holm-sidak, simes-hochberg,
hommel, fdr_bh, fdr_by, fdr_tsbh, fdr_tsbky).

Examples
--------
Benjamini-Hochberg at the default alpha:
  $ seekr_adj_pval pvals.csv fdr_bh -o adj_pvals

Bonferroni at alpha 0.01:
  $ seekr_adj_pval pvals.csv bonferroni -a 0.01 -o adj_pvals

Extreme scale (extension): a .npy input (-bi, from seekr_find_pval -bo)
is corrected with BOUNDED memory — the matrix stays on disk, values are
bucket-sorted through memory-mapped scratch, results are bitwise equal
to the in-memory path (every method except hommel):
  $ seekr_adj_pval pvals.npy fdr_bh -bi -o adj_pvals -bo adj.npy

Streamed SELF artifacts (extension): tile-wise writers cannot mirror to
exact symmetry, so at extreme scale the 5-decimal auto-detection can
read asymmetric retiling noise — force the upper-triangle contract
(and skip the detection's full extra read of the artifact):
  $ seekr_adj_pval pvals.npy fdr_bh -bi --symmetric yes -o adj_pvals
"""

KMER_HEATMAP_DOC = """
Description
-----------
Heatmap of an r- or p-value matrix with a two/three-color gradient
pivoting at 'threshold' (hex colors accepted), optional hierarchical
clustering of rows and columns with inset dendrograms, and a threshold
tick on the colorbar.  The two positionals bound the color scale
(e.g. 0 1 for p-values, -1 1 for r-values).

Examples
--------
P-value heatmap, clustered:
  $ seekr_kmer_heatmap pvals.csv 0 1

R-value heatmap with a 0.13 pivot, custom size/format:
  $ seekr_kmer_heatmap pearson.csv -1 1 -th 0.13 -hf png -hd 300
"""

KMER_DENDROGRAM_DOC = """
Description
-----------
Dendrogram of the hierarchical clustering of a matrix's rows (-dd row)
or columns (-dd column), with configurable distance metric and linkage
method — a view of the clustering seekr_kmer_heatmap applies.

Examples
--------
Row dendrogram of a pearson matrix:
  $ seekr_kmer_dendrogram pearson.csv -dd row

Column dendrogram, ward linkage, taller figure:
  $ seekr_kmer_dendrogram pvals.csv -dd column -linkm ward -ph 10
"""

KMER_LEIDEN_DOC = """
Description
-----------
Leiden community detection over fasta sequences: counts (normalized by
the given mean/std vectors), self-Pearson, edges kept above
-pco pearsoncutoff, then the Leiden algorithm (native C++ engine; six
partition types) with spring-layout network plot and Gephi-ready
nodes/edges CSVs.

Examples
--------
Default RBER partition at resolution 1.0:
  $ seekr_kmer_leiden rnas.fa mean_4.npy std_4.npy 4 -a RBERVertexPartition -pn net

CPM partition, higher resolution, seeded, edge cutoff 0.1:
  $ seekr_kmer_leiden rnas.fa mean_4.npy std_4.npy 4 -a CPMVertexPartition -r 1.5 -sd -pco 0.1
"""

KMER_COUNT_BARPLOT_DOC = """
Description
-----------
Grouped barplot comparing the normalized k-mer counts of up to 10
sequences, showing the -tn k-mers whose counts deviate most from the
column mean (summed |difference|, ascending or descending).

Examples
--------
Top 10 most-deviant k-mers of a small fasta:
  $ seekr_kmer_count_barplot rnas.fa mean_4.npy std_4.npy 4 -o barplot

Top 20, ascending order, png output:
  $ seekr_kmer_count_barplot rnas.fa mean_4.npy std_4.npy 4 -tn 20 -sm ascending -pf png
"""

KMER_MSD_BARPLOT_DOC = """
Description
-----------
Barplot of each k-mer's mean count +/- standard deviation across all
sequences of a fasta, ordered by mean or sd, limited to the -tn most
extreme k-mers.

Examples
--------
Default (top 10 by mean, descending):
  $ seekr_kmer_msd_barplot rnas.fa mean_4.npy std_4.npy 4 -o msd

Top 15 by standard deviation:
  $ seekr_kmer_msd_barplot rnas.fa mean_4.npy std_4.npy 4 -tn 15 -ss sd
"""

KMER_COMP_TEXTPLOT_DOC = """
Description
-----------
Render two sequences character by character (wrapped at -wl columns)
with up to 10 motif words highlighted in color; overlapping motifs take
the first word's color.  Useful for eyeballing shared k-mer content
between two specific transcripts.

Examples
--------
Compare two fastas' first sequences, highlighting two motifs:
  $ seekr_kmer_comp_textplot a.fa b.fa 'ATTA,AAAA' -o comp

Wider wrap and custom colors:
  $ seekr_kmer_comp_textplot a.fa b.fa 'GGGG' -wl 80 -cv '#d62728'
"""

KMER_INDI_TEXTPLOT_DOC = """
Description
-----------
Same character-grid rendering as seekr_kmer_comp_textplot but one plot
per sequence of the input fasta, saved into -op; each plot is named by
the header up to the first '|'.

Examples
--------
All sequences, two motifs, into plots/:
  $ seekr_kmer_indi_textplot rnas.fa 'ATTA,AAAA' -op plots/
"""

GEN_RAND_RNAS_DOC = """
Generate random RNAs that preserve the k-mer content of an input fasta
(legacy seekr 1.x capability, reconstructed): each sequence is replaced by
a k-mer-multiset-preserving Euler shuffle, optionally with point
mutations, optionally shuffling the pooled concatenation (-g).

Example:
  $ seekr_gen_rand_rnas rnas.fa rand_rnas.fa -k 2 -m 5 -s 0
"""

PWMS_DOC = """
Weight k-mer count profiles by protein-binding motif PWMs (legacy seekr
1.x capability, reconstructed): each sequence is scored against every
position-weight-matrix file in a directory; scores are the PWM-alignment
weight vector dotted with the sequence's k-mer counts.

Example:
  $ seekr_pwms pwms/ counts.npy -k 5 -o pwm_scores.csv
"""

GRAPH_DOC = """
Louvain/Leiden community graph from an adjacency matrix (legacy seekr
1.x capability, reconstructed): threshold the matrix, build the weighted
graph, partition its largest connected component (native engine), and
write a Group-annotated GML plus a node-to-community CSV.

Example:
  $ seekr_graph adj.npy -g graph.gml -c communities.csv -t 0.13
"""

CANONICAL_GENCODE_DOC = """
Keep only '-001'-named transcripts from an old-style GENCODE fasta
(legacy seekr 1.x capability, reconstructed). Modern releases dropped
-001 numbering; use seekr_filter_gencode with a GTF instead.

Example:
  $ seekr_canonical_gencode v22_lncRNAs.fa v22_canonical.fa -z 2
"""

VISUALIZE_DISTRO_DOC = """
Histogram of a similarity matrix's r-value distribution (legacy seekr
1.x capability, reconstructed): strict upper triangle for symmetric
matrices, all finite values otherwise, summary stats in the title.

Example:
  $ seekr_visualize_distro pearson.npy -o distro -b 100
"""

DOMAIN_PEARSON_DOC = """
Sliding-window domain Pearson (legacy seekr 1.x capability,
reconstructed): correlate whole-query k-mer profiles against windows
tiled across target sequences; r peaks mark query-like domains. With a
reference fasta, each r also gets a percentile within that query's
r-distribution against the reference.

Example:
  $ seekr_domain_pearson queries.fa targets.fa -r gencode.fa \\
      -rp r_values.csv -pp percentiles.csv -w 1000 -sl 100 -k 6
"""

PIPELINE_DOC = """
One-shot end-to-end analysis (extension): background norm vectors +
empirical null, query counts, all-pairs Pearson, empirical p-values, and
multiple-test correction — all in-memory, artifacts written once.
Equivalent to the chain seekr_norm_vectors -> seekr_kmer_counts ->
seekr_pearson -> seekr_find_dist -> seekr_find_pval -> seekr_adj_pval;
--leiden appends community detection on the self-similarity graph
(seekr_kmer_leiden's role), writing communities.csv.

Example:
  $ seekr_tpu_pipeline queries.fa -b gencode_lncRNA.fa -k 6 -o results/
  $ seekr_tpu_pipeline rnas.fa -b bkg.fa --leiden -lc 0.1 -o results/
"""


SERVE_DOC = """
Warm-resident similarity service over a UNIX socket (extension command).

Loads the background norm vectors (and optionally a target fasta +
find_dist fitres) ONCE, pre-compiles the device executables, then
answers newline-delimited-JSON queries with zero per-request cold
start:

  request : {"seqs": ["AGTC...", ...], "want": ["sim", "pvals"]}
  response: {"ok": true, "sim": [[...]], "pvals": [[...]], "m":Q, "n":T}
  top-k   : {"seqs": [...], "want": ["topk"], "topk": 10} returns the
            10 nearest targets per query (topk_sim / topk_idx /
            topk_names, + topk_pvals via want=["topk_pvals"]) —
            selected on device, so the full [Q, T] row never leaves it
  ops     : {"op": "ping"} (health + latency percentiles),
            {"op": "add_targets", "seqs"/"fasta": ...} (grow the
            resident corpus without a restart; append-only),
            {"op": "save_corpus", "path": "c.npz"} (snapshot the
            resident corpus, growth included — restart with -t c.npz
            to skip counting the fasta),
            {"op": "shutdown"}

The socket is created owner-only (0600).  Client-directed disk writes
("outfile" prefixes, save_corpus paths) are rejected unless the server
is started with --allow-artifacts DIR, and are then confined to DIR
(symlinks and .. resolved before the check).

Results are identical to the seekr_kmer_counts + seekr_pearson +
seekr_find_pval artifact chain for the same inputs.

With -dp N the standardized target corpus is row-sharded over N mesh
devices (a corpus too big for one chip's HBM lives as ~T/N rows per
chip) and top-k runs as a two-stage distributed selection: each device
ranks its local shard and only the candidate rows cross the ICI.

Example:
  $ seekr_tpu_serve mean.npy std.npy -k 6 -t gencode.fa \\
        -fr fitres.csv --socket /tmp/seekr.sock
  $ printf '{"seqs": ["AGTCAGTC..."], "want": ["sim"]}\\n' | \\
        nc -U /tmp/seekr.sock
"""


def console_serve(argv=None):
    parser = argparse.ArgumentParser(usage=SERVE_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("mean_path", help="normalization mean vector (.npy).")
    parser.add_argument("std_path", help="normalization std vector (.npy).")
    parser.add_argument("-k", "--kmer", default=6,
                        help="length of kmers you want to count.")
    parser.add_argument("-l", "--log2", default="Log2.post",
                        choices=["Log2.post", "Log2.pre", "Log2.none"],
                        help="log2 transform mode.")
    parser.add_argument("-t", "--targets", default=None,
                        help="target fasta — queries are scored against "
                             "these rows (default: against the query "
                             "batch itself) — or a .npz corpus snapshot "
                             "written by --save-corpus, which skips "
                             "counting the fasta at startup.")
    parser.add_argument("--save-corpus", default=None, dest="save_corpus",
                        help="write the loaded target corpus as a "
                             "restartable .npz snapshot and exit (serve "
                             "later with -t <snapshot>.npz); a running "
                             "server snapshots via the save_corpus op "
                             "instead.")
    parser.add_argument("-fr", "--fitres_file", default=None,
                        help="find_dist fitres csv enabling 'pvals'.")
    parser.add_argument("-ft", "--fitres_type", default="distribution",
                        choices=["distribution", "npy"],
                        help="fitres artifact kind (see seekr_find_pval).")
    parser.add_argument("--socket", default="seekr_tpu.sock",
                        help="UNIX socket path to listen on (created "
                             "owner-only, mode 0600).")
    parser.add_argument("--allow-artifacts", default=None,
                        dest="allow_artifacts", metavar="DIR",
                        help="permit client-directed disk writes "
                             "(query 'outfile' prefixes and the "
                             "save_corpus op), confined to DIR; without "
                             "this flag such requests are rejected.")
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip executable pre-compilation.")
    parser.add_argument("--mem-budget", default=None, type=int,
                        dest="mem_budget", metavar="BYTES",
                        help="resident-corpus device-memory budget in "
                             "bytes (per device on a mesh); add_targets "
                             "past it is refused with the measured "
                             "numbers.  Default: half the device's "
                             "reported HBM limit (SEEKR_TPU_CORPUS_BUDGET "
                             "also sets it).")
    parser.add_argument("--grow-quantum", default=256, type=int,
                        dest="grow_quantum", metavar="ROWS",
                        help="resident corpus width is padded to a "
                             "multiple of this many rows, so repeated "
                             "small add_targets grows mint O(1) compiled "
                             "executables per quantum instead of one per "
                             "grow; 1 disables.")
    parser.add_argument("--no-coalesce", action="store_true",
                        help="serve each request as its own device batch "
                             "instead of merging concurrent requests.")
    parser.add_argument("-dp", "--data_parallel", default=None, type=int,
                        help="devices on the mesh 'data' axis; >1 shards "
                             "the standardized target corpus one row "
                             "block per device and serves top-k as a "
                             "two-stage distributed selection — corpora "
                             "too big for one chip's HBM (extension).")
    parser.add_argument("--coordinator", default=None,
                        help="host0 address for multi-host bootstrap, e.g. "
                             "host0:8476 (extension).")
    parser.add_argument("--num_processes", default=None, type=int,
                        help="total processes for multi-host bootstrap "
                             "(extension).")
    parser.add_argument("--process_id", default=None, type=int,
                        help="this process's id for multi-host bootstrap "
                             "(extension).")
    args = _parse_args_or_exit(parser, argv)
    _enable_xla_cache()

    from seekr_tpu.serve import SeekrService, serve_forever

    mesh = None
    if args.data_parallel or (args.num_processes or 0) > 1:
        if (args.data_parallel or 0) > 1 and not args.targets:
            # validate BEFORE building the mesh: the flag contradiction
            # is the user's first problem whatever the device count is
            parser.error("-dp requires -t/--targets: the sharded corpus "
                         "is the thing being distributed")
        from seekr_tpu.parallel.mesh import build_mesh_from_flags

        mesh = build_mesh_from_flags(args.data_parallel,
                                     coordinator=args.coordinator,
                                     num_processes=args.num_processes,
                                     process_id=args.process_id)
        if mesh is not None and not args.targets:
            parser.error("-dp requires -t/--targets: the sharded corpus "
                         "is the thing being distributed")
        if (args.num_processes or 0) > 1 and mesh is None:
            # without a mesh no process would take the follower path:
            # N independent unsharded servers would come up instead of
            # a pod — the exact HBM blow-up pod serving exists to avoid
            parser.error("--num_processes > 1 requires -dp N covering "
                         "all devices (a multi-host serve must shard "
                         "the corpus over one global mesh)")
    fitres = None
    if args.fitres_file:
        fitres = parse_fitres_csv(args.fitres_file, args.fitres_type)
    if args.save_corpus and not args.targets:
        parser.error("--save-corpus requires -t/--targets: the snapshot "
                     "is the loaded target corpus")
    svc = SeekrService(args.mean_path, args.std_path, k=int(args.kmer),
                       log2=args.log2, targets=args.targets, fitres=fitres,
                       coalesce=not args.no_coalesce, mesh=mesh,
                       mem_budget_bytes=args.mem_budget,
                       grow_quantum=args.grow_quantum)
    import jax

    if mesh is not None and jax.process_count() > 1 and \
            jax.process_index() != 0:
        # pod follower: mirror the leader's device calls (including its
        # warmup broadcasts) until the leader's shutdown releases us —
        # a single-process accept loop cannot drive multi-host SPMD
        print(f"seekr_tpu_serve: process {jax.process_index()} "
              "following leader", flush=True)
        svc.follow()
        return
    if args.save_corpus:
        # leader-only (followers are in follow() above on a pod and the
        # snapshot needs no device call); stop_followers in finally so a
        # failed save (bad suffix, unwritable path) still releases the
        # followers instead of wedging them in broadcast forever
        try:
            svc.save_corpus(args.save_corpus)
        finally:
            svc.stop_followers()
        print(f"seekr_tpu_serve: corpus snapshot written to "
              f"{args.save_corpus} (serve with -t {args.save_corpus})",
              flush=True)
        return
    if not args.no_warmup:
        print("seekr_tpu_serve: warming executables...", flush=True)
        svc.warmup()
    print(f"seekr_tpu_serve: listening on {args.socket}", flush=True)
    serve_forever(svc, args.socket, artifact_dir=args.allow_artifacts)


QUERY_DOC = """
Query a running seekr_tpu_serve service (extension command).

The client half of the serving pair: reads query sequences from a
fasta, sends one request over the service's UNIX socket, and writes the
results as CSV — no jax, no device, no artifacts needed on the client
side.  Default output is the full [Q, T] similarity matrix with query
headers as rows and target headers as columns; --topk N switches to the
N nearest targets per query as tidy rows (query, rank, target, r) —
selected on the device, so the full matrix never crosses the wire.

Example:
  $ seekr_tpu_serve mean.npy std.npy -k 6 -t gencode.fa --socket s.sock &
  $ seekr_tpu_query queries.fa --socket s.sock -o sim.csv
  $ seekr_tpu_query queries.fa --socket s.sock --topk 10 --pvals
  $ seekr_tpu_query queries.fa --socket s.sock --npy /tmp/big  # .npy mode
"""


def console_query(argv=None):
    parser = argparse.ArgumentParser(usage=QUERY_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("query_fasta",
                        help="fasta file with the query sequences.")
    parser.add_argument("--socket", default="seekr_tpu.sock",
                        help="UNIX socket path of the running service.")
    parser.add_argument("-o", "--outfile", default=None,
                        help="write the CSV here (default: stdout).")
    parser.add_argument("--pvals", action="store_true",
                        help="also request p-values (service must have "
                             "been started with a fitres).")
    parser.add_argument("--topk", default=0, type=int,
                        help="return the N nearest targets per query "
                             "instead of the full matrix.")
    parser.add_argument("--npy", default=None,
                        help="server-side artifact mode: full matrices "
                             "are written by the SERVICE process as "
                             "<prefix>_sim.npy / <prefix>_pvals.npy "
                             "(skips JSON-encoding large results).")
    parser.add_argument("--timeout", default=600.0, type=float,
                        help="socket timeout in seconds.")
    args = _parse_args_or_exit(parser, argv)

    import os

    import pandas as pd

    from seekr_tpu.io.fasta import Reader
    from seekr_tpu.serve import request

    reader = Reader(args.query_fasta)
    seqs = reader.get_seqs()
    names = [h[1:] for h in reader.get_headers()]

    if args.topk:
        want = ["topk", "topk_pvals"] if args.pvals else ["topk"]
    else:
        want = ["sim", "pvals"] if args.pvals else ["sim"]
    payload = {"seqs": seqs, "want": want, "names": not args.topk}
    if args.topk:
        payload["topk"] = args.topk
    if args.npy:
        payload["outfile"] = args.npy
    resp = request(args.socket, payload, timeout=args.timeout)
    if not resp.get("ok"):
        print(f"seekr_tpu_query: service error: {resp.get('error')}",
              file=sys.stderr)
        sys.exit(1)

    if args.topk:
        # tidy rows: one line per (query, rank) hit
        targets = resp.get("topk_names") or resp["topk_idx"]
        rows = []
        for qi, (trow, rrow) in enumerate(zip(targets, resp["topk_sim"])):
            for rank, (t, r) in enumerate(zip(trow, rrow)):
                row = {"query": names[qi], "rank": rank, "target": t,
                       "r": r}
                if "topk_pvals" in resp:
                    row["pval"] = resp["topk_pvals"][qi][rank]
                rows.append(row)
        df = pd.DataFrame(rows)
        out = df.to_csv(args.outfile, index=False)
        if out is not None:  # to_csv(path) returns None; stdout mode only
            print(out, end="")
        return
    if args.npy:
        for key, path in resp.get("files", {}).items():
            print(f"{key}: {path}")
        return
    cols = resp.get("target_names", names)
    for key in ("sim", "pvals"):
        if key in resp:
            df = pd.DataFrame(resp[key], index=names, columns=cols)
            dest = args.outfile
            if dest and "pvals" in resp and "sim" in resp:
                root, ext = os.path.splitext(dest)
                dest = f"{root}_{key}{ext or '.csv'}"
            out = df.to_csv(dest)
            if out is not None:
                print(out, end="")


DOCTOR_DOC = """
Environment health report (extension command).

Checks each runtime layer the framework spans and prints one line per
check: Python-stack versions, the native C++ engines (build/load
status), the AOT executable store, SEEKR_TPU_* env overrides, and the
accelerator itself — probed in a SUBPROCESS under a timeout, so a
wedged device link is reported instead of hanging the doctor.

Exit code 0 when no check fails.

Example:
  $ seekr_tpu_doctor
  $ seekr_tpu_doctor --no-device          # host-only checks
  $ seekr_tpu_doctor --device-timeout 30
"""


def console_doctor(argv=None):
    from seekr_tpu.utils.doctor import run_doctor

    parser = argparse.ArgumentParser(usage=DOCTOR_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("--device-timeout", default=90.0, type=float,
                        help="seconds before the accelerator probe is "
                             "declared hung.")
    parser.add_argument("--no-device", action="store_true",
                        help="skip the accelerator probe (host-only).")
    if argv is None:
        argv = sys.argv[1:]
    if not argv:
        # unlike the data commands (bare invocation = help, reference
        # convention), a bare doctor RUNS — that is the whole point —
        # whether invoked via the entry point (argv=None) or the module
        # dispatcher (argv=[])
        argv = ["--device-timeout", "90"]
    args = _parse_args_or_exit(parser, argv)
    healthy = run_doctor(device_timeout=args.device_timeout,
                         skip_device=args.no_device)
    sys.exit(0 if healthy else 1)


class _CollectParser(Exception):
    """Carrier for parser harvesting (see _collect_parser)."""

    def __init__(self, parser):
        self.parser = parser


_COLLECT = object()  # sentinel argv: harvest the parser instead of parsing


def _parse_args_or_exit(parser, argv=None):
    if argv is _COLLECT:
        raise _CollectParser(parser)
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        parser.print_help()
        sys.exit(0)
    return parser.parse_args(argv)


def _collect_parser(console_fn) -> argparse.ArgumentParser:
    """Harvest a command's fully-built argparse parser without running it.

    Every command funnels through _parse_args_or_exit, so passing the
    _COLLECT sentinel as argv aborts the command right at the parse point
    with its parser in hand.  This keeps the ``seekr`` manual (which prints
    every command's complete flag/default table) permanently in sync with
    the real parsers — there is no second copy of any flag definition.
    """
    try:
        console_fn(argv=_COLLECT)
    except _CollectParser as collected:
        return collected.parser
    raise RuntimeError("command did not route through _parse_args_or_exit")


def _enable_xla_cache():
    """Persistent XLA cache so later runs skip the 20-60s bucket compiles.

    Called only by device-backed commands — it imports JAX, which the pure
    host commands (heatmap, dendrogram, adj_pval, textplots, downloader,
    filter) must not pay for.  Also starts a jax.profiler trace spanning
    the command when SEEKR_TPU_TRACE is set.
    """
    from seekr_tpu.utils.compile_cache import enable_compilation_cache
    from seekr_tpu.utils.profiler import start_trace_if_configured

    enable_compilation_cache()
    start_trace_if_configured()


def _formatter():
    return argparse.ArgumentDefaultsHelpFormatter


# -- download_gencode --------------------------------------------------------

def _run_download_gencode(biotype, species, gtf, release, fasta_path,
                          gtf_path, unzip):
    from seekr_tpu.data import Downloader

    Downloader().get_gencode(biotype, species, gtf, release, fasta_path,
                             gtf_path, unzip)


def console_download_gencode(argv=None):
    parser = argparse.ArgumentParser(usage=DOWNLOAD_GENCODE_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("biotype", help="GENCODE set: 'all', 'pc', or 'lncRNA'.")
    parser.add_argument("-s", "--species", default="human",
                        help="'human' or 'mouse'.")
    parser.add_argument("-g", "--gtf", action="store_true",
                        help="Also download the comprehensive gtf file.")
    parser.add_argument("-r", "--release", default=None,
                        help="Specific release (e.g. 'M5'); latest if omitted.")
    parser.add_argument("-fp", "--fasta_path", default=None,
                        help="Output path for the fasta (.gz).")
    parser.add_argument("-gp", "--gtf_path", default=None,
                        help="Output path for the gtf (.gz).")
    parser.add_argument("-z", "--zip", action="store_false",
                        help="Set to keep the downloaded files gzipped.")
    args = _parse_args_or_exit(parser, argv)
    _run_download_gencode(args.biotype, args.species, args.gtf, args.release,
                          args.fasta_path, args.gtf_path, args.zip)


# -- filter_gencode ----------------------------------------------------------

def console_filter_gencode(argv=None):
    from seekr_tpu.data import filter_gencode

    parser = argparse.ArgumentParser(usage=FILTER_GENCODE_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("fasta", help="Fasta file to filter (GENCODE format).")
    parser.add_argument("-gtf", "--gtf_path", default=None,
                        help="Matching gtf (needed for -can / -iso).")
    parser.add_argument("-len", "--len_threshold", default=0,
                        help="Keep sequences with length >= threshold.")
    parser.add_argument("-can", "--canonical", action="store_true",
                        help="Keep only Ensembl_canonical transcripts.")
    parser.add_argument("-iso", "--isoform", default="0",
                        help="Isoform number filter (regex allowed); "
                             "'0' disables.")
    parser.add_argument("-rd", "--rmdup", action="store_true",
                        help="Remove exact-duplicate sequences (keep first).")
    parser.add_argument("-o", "--outputname", default="test",
                        help="Output name; '.fa' appended automatically.")
    args = _parse_args_or_exit(parser, argv)
    filter_gencode(args.fasta, args.gtf_path, int(args.len_threshold),
                   args.canonical, args.isoform, args.rmdup, args.outputname)


# -- gen_rand_rnas (legacy capability) ---------------------------------------

def _run_gen_rand_rnas(infasta, outfasta, kmer, mutations, seed, group):
    from seekr_tpu.data.rand_rnas import gen_rand_rnas

    gen_rand_rnas(infasta, outfasta, k=int(kmer), mutations=int(mutations),
                  seed=None if seed is None else int(seed), group=group)


def console_gen_rand_rnas(argv=None):
    parser = argparse.ArgumentParser(usage=GEN_RAND_RNAS_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("infasta", help="Full path of fasta file to shuffle.")
    parser.add_argument("outfasta", help="Path for the shuffled fasta.")
    parser.add_argument("-k", "--kmer", default=1,
                        help="Size of the preserved kmers (1 = composition "
                             "only).")
    parser.add_argument("-m", "--mutations", default=0,
                        help="Number of point mutations per sequence.")
    parser.add_argument("-s", "--seed", default=None,
                        help="RNG seed for reproducible output.")
    parser.add_argument("-g", "--group", action="store_true",
                        help="Shuffle the pooled concatenation of all "
                             "sequences instead of each individually.")
    args = _parse_args_or_exit(parser, argv)
    _run_gen_rand_rnas(args.infasta, args.outfasta, args.kmer, args.mutations,
                       args.seed, args.group)


# -- pwms (legacy capability) ------------------------------------------------

def _run_pwms(pwm_dir, counts, kmer, out_path):
    from seekr_tpu.models.pwm import CountsWeighter

    CountsWeighter(pwm_dir, counts, k=int(kmer), out_path=out_path).run()


def console_pwms(argv=None):
    parser = argparse.ArgumentParser(usage=PWMS_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("pwm_dir", help="Directory of tab-separated PWM "
                                        "files (Pos/A/C/G/U columns).")
    parser.add_argument("counts", help="k-mer counts artifact (.npy or "
                                       "labeled CSV) to score.")
    parser.add_argument("-k", "--kmer", default=5,
                        help="Length of kmers the counts were made with.")
    parser.add_argument("-o", "--out_path", default=None,
                        help="CSV path for the PWM x sequence score table.")
    args = _parse_args_or_exit(parser, argv)
    _run_pwms(args.pwm_dir, args.counts, args.kmer, args.out_path)


# -- graph (legacy capability) -----------------------------------------------

def _run_graph(adj, gml_path, csv_path, threshold, gamma, n_comms, seed):
    from seekr_tpu.graph.maker import Maker

    maker = Maker(adj, gml_path=gml_path, csv_path=csv_path,
                  threshold=float(threshold), gamma=float(gamma),
                  n_comms=int(n_comms),
                  seed=None if seed is None else int(seed))
    maker.make_gml_csv_files()


def console_graph(argv=None):
    parser = argparse.ArgumentParser(usage=GRAPH_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("adj", help="Adjacency matrix (.npy or labeled CSV), "
                                    "e.g. a seekr_pearson output.")
    parser.add_argument("-g", "--gml_path", default="graph.gml",
                        help="Path for the Group-annotated GML file.")
    parser.add_argument("-c", "--csv_path", default="graph.csv",
                        help="Path for the node-to-community CSV.")
    parser.add_argument("-t", "--threshold", default=0, type=float,
                        help="Zero adjacency entries below this value.")
    parser.add_argument("-m", "--gamma", default=1.0, type=float,
                        help="Resolution parameter of the partition.")
    parser.add_argument("-n", "--n_comms", default=5, type=int,
                        help="Cap on the number of distinct community ids.")
    parser.add_argument("-s", "--seed", default=None,
                        help="Partition RNG seed (default: unseeded).")
    args = _parse_args_or_exit(parser, argv)
    _run_graph(args.adj, args.gml_path, args.csv_path, args.threshold,
               args.gamma, args.n_comms, args.seed)


# -- canonical_gencode (legacy capability) -----------------------------------

def _run_canonical_gencode(in_fasta, out_fasta, zeros):
    from seekr_tpu.data.canonical import canonical_gencode

    canonical_gencode(in_fasta, out_fasta, zeros=int(zeros))


def console_canonical_gencode(argv=None):
    parser = argparse.ArgumentParser(usage=CANONICAL_GENCODE_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("in_fasta", help="Old-style GENCODE fasta to filter.")
    parser.add_argument("out_fasta", help="Path for the filtered fasta.")
    parser.add_argument("-z", "--zeros", default=2,
                        help="Zeros in the kept suffix (2 -> '-001').")
    args = _parse_args_or_exit(parser, argv)
    _run_canonical_gencode(args.in_fasta, args.out_fasta, args.zeros)


# -- visualize_distro (legacy capability) ------------------------------------

def _run_visualize_distro(adj, outputname, bins, pformat, pdpi,
                          symmetric=None):
    from seekr_tpu.viz.visualize_distro import visualize_distro

    visualize_distro(adj, outputname=outputname, bins=int(bins),
                     pformat=pformat, pdpi=int(pdpi), symmetric=symmetric)


def console_visualize_distro(argv=None):
    parser = argparse.ArgumentParser(usage=VISUALIZE_DISTRO_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("adj", help="Similarity matrix (.npy or labeled "
                                    "CSV), e.g. a seekr_pearson output.")
    parser.add_argument("-o", "--outputname", default="distro",
                        help="Output path without extension.")
    parser.add_argument("-b", "--bins", default=100,
                        help="Histogram bin count.")
    parser.add_argument("-pf", "--pformat", default="pdf",
                        help="Figure format (matplotlib-supported).")
    parser.add_argument("-d", "--pdpi", default=300,
                        help="Figure resolution in dpi.")
    parser.add_argument("--symmetric", default="auto",
                        choices=["auto", "yes", "no"],
                        help="streamed .npy mode: skip the transpose "
                             "detection (a full extra read of a "
                             "multi-GB artifact) when you already know "
                             "(extension).")
    args = _parse_args_or_exit(parser, argv)
    _run_visualize_distro(args.adj, args.outputname, args.bins, args.pformat,
                          args.pdpi,
                          {"auto": None, "yes": True,
                           "no": False}[args.symmetric])


# -- domain_pearson (legacy capability) --------------------------------------

def _run_domain_pearson(query, target, reference, r_values_path,
                        percentiles_path, mean, std, log2, kmer, window,
                        slide):
    from seekr_tpu.models.domain import DomainPearson

    DomainPearson(query_path=query, target_path=target,
                  reference_path=reference, r_values_path=r_values_path,
                  percentiles_path=percentiles_path,
                  mean=mean if mean is not None else True,
                  std=std if std is not None else True,
                  log2=log2, k=int(kmer), window=int(window),
                  slide=int(slide)).run()


def console_domain_pearson(argv=None):
    parser = argparse.ArgumentParser(usage=DOMAIN_PEARSON_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("query", help="Fasta of query transcripts "
                                      "(profiled whole).")
    parser.add_argument("target", help="Fasta of target sequences "
                                       "(tiled into windows).")
    parser.add_argument("-r", "--reference", default=None,
                        help="Fasta providing the percentile null "
                             "distribution (optional).")
    parser.add_argument("-rp", "--r_values_path", default="r_values.csv",
                        help="CSV path for the window x query r-values.")
    parser.add_argument("-pp", "--percentiles_path", default=None,
                        help="CSV path for the window x query percentiles "
                             "(needs --reference).")
    parser.add_argument("-m", "--mean", default=None,
                        help="Path to a .npy mean vector (default: computed "
                             "from the reference fasta, else the windows).")
    parser.add_argument("-s", "--std", default=None,
                        help="Path to a .npy std vector (same default rule).")
    parser.add_argument("-l", "--log2", default="Log2.post",
                        choices=["Log2.pre", "Log2.post", "Log2.none"],
                        help="Log2 transform mode.")
    parser.add_argument("-k", "--kmer", default=6,
                        help="Length of kmers to profile.")
    parser.add_argument("-w", "--window", default=1000,
                        help="Window width in bases.")
    parser.add_argument("-sl", "--slide", default=100,
                        help="Window stride in bases.")
    args = _parse_args_or_exit(parser, argv)
    _run_domain_pearson(args.query, args.target, args.reference,
                        args.r_values_path, args.percentiles_path,
                        args.mean, args.std, args.log2, args.kmer,
                        args.window, args.slide)


# -- kmer_counts -------------------------------------------------------------

def _run_kmer_counts(fasta, outfile, kmer, binary, centered, standardized,
                     log2, remove_labels, mean_vector, std_vector, alphabet):
    from seekr_tpu.models.counter import KmerCounter

    mean = mean_vector or centered
    std = std_vector or standardized
    label = not remove_labels
    counter = KmerCounter(fasta, outfile, kmer, binary, mean, std, log2,
                          label=label, alphabet=alphabet)
    counter.make_count_file()


def console_kmer_counts(argv=None):
    parser = argparse.ArgumentParser(usage=KMER_COUNTS_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("fasta", help="Full path of fasta file.")
    parser.add_argument("-o", "--outfile", default="counts.seekr",
                        help="Name of file to save counts to.")
    parser.add_argument("-k", "--kmer", default=6,
                        help="Length of kmers you want to count.")
    parser.add_argument("-b", "--binary", action="store_true",
                        help="Set if output should be a .npy file.")
    parser.add_argument("-uc", "--uncentered", action="store_false",
                        help="Set if output should not have the mean "
                             "subtracted.")
    parser.add_argument("-us", "--unstandardized", action="store_false",
                        help="Set if output should not be divided by the "
                             "standard deviation.")
    parser.add_argument("-l", "--log2", default="Log2.post",
                        choices=["Log2.post", "Log2.pre", "Log2.none"],
                        help="Decided if and when to log transform counts")
    parser.add_argument("-rl", "--remove_labels", action="store_true",
                        help="Set to save without index and column labels.")
    parser.add_argument("-mv", "--mean_vector", default=None,
                        help="Optional path to mean vector numpy file.")
    parser.add_argument("-sv", "--std_vector", default=None,
                        help="Optional path to std vector numpy file.")
    parser.add_argument("-a", "--alphabet", default="AGTC",
                        help="Valid letters to include in kmer.")
    args = _parse_args_or_exit(parser, argv)
    _enable_xla_cache()
    _run_kmer_counts(args.fasta, args.outfile, int(args.kmer), args.binary,
                     args.uncentered, args.unstandardized, args.log2,
                     args.remove_labels, args.mean_vector, args.std_vector,
                     args.alphabet)


# -- pearson -----------------------------------------------------------------

# outputs beyond this many cells are streamed in row blocks instead of
# materializing the full matrix + a pandas frame on host — one policy
# shared with models.pearson's internal blocking decision (jax-free import)
from seekr_tpu.io.stream import STREAM_CELL_THRESHOLD as _STREAM_CELLS


def _run_pearson(counts1, counts2, outfile, binary_input, binary_output):
    import numpy as np
    import pandas as pd

    from seekr_tpu.models.pearson import pearson

    names1 = names2 = None
    if binary_input:
        counts1 = np.load(counts1)
        counts2 = np.load(counts2)
    else:
        from seekr_tpu.io.fast_csv import read_labeled_csv

        counts1 = read_labeled_csv(counts1)
        counts2 = read_labeled_csv(counts2)
        names1 = counts1.index.values
        names2 = counts2.index.values

    n_cells = counts1.shape[0] * counts2.shape[0]
    if n_cells > _STREAM_CELLS:
        from seekr_tpu.io.stream import (StreamingCsvWriter,
                                         StreamingNpyWriter, stream_pearson)

        if binary_output:
            writer = StreamingNpyWriter(outfile,
                                        (counts1.shape[0], counts2.shape[0]))
        else:
            writer = StreamingCsvWriter(
                outfile,
                columns=(names2 if names2 is not None
                         else range(counts2.shape[0])),
                row_labels=(names1 if names1 is not None
                            else range(counts1.shape[0])),
                fmt="%s")
        with writer:
            stream_pearson(np.asarray(counts1, dtype=np.float32),
                           np.asarray(counts2, dtype=np.float32), writer)
        return

    if binary_output:
        pearson(counts1, counts2, outfile=outfile)
    else:
        from seekr_tpu.io.fast_csv import write_labeled_csv

        dist = pearson(counts1, counts2)
        write_labeled_csv(
            outfile, dist,
            names1 if names1 is not None else range(dist.shape[0]),
            names2 if names2 is not None else range(dist.shape[1]))


def console_pearson(argv=None):
    parser = argparse.ArgumentParser(usage=PEARSON_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("counts1", help="Count file from seekr_kmer_counts.")
    parser.add_argument("counts2",
                        help="Second count file (may equal the first).")
    parser.add_argument("-o", "--outfile", default="pearson.seekr",
                        help="Path of file to save similarities to.")
    parser.add_argument("-bi", "--binary_input", action="store_true",
                        help="Set if the input will be a .npy file.")
    parser.add_argument("-bo", "--binary_output", action="store_true",
                        help="Set if output should be a .npy file.")
    args = _parse_args_or_exit(parser, argv)
    _enable_xla_cache()
    _run_pearson(args.counts1, args.counts2, args.outfile, args.binary_input,
                 args.binary_output)


# -- norm_vectors ------------------------------------------------------------

def _run_norm_vectors(fasta, mean_vector, std_vector, log2, kmer):
    import numpy as np

    from seekr_tpu.models.counter import KmerCounter

    counter = KmerCounter(fasta, k=int(kmer), log2=log2)
    # device path: computes + sets .mean/.std without fetching the full
    # [m, 4^k] normalized matrix (~3 GB at GENCODE scale) that this
    # command never uses — only the two [4^k] vectors cross to host
    counter.get_counts_device()
    np.save(mean_vector, counter.mean)
    np.save(std_vector, counter.std)


def console_norm_vectors(argv=None):
    parser = argparse.ArgumentParser(usage=NORM_VECTORS_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("fasta", help="path to .fa file")
    parser.add_argument("-mv", "--mean_vector", default="mean.npy",
                        help="path to output mean vector")
    parser.add_argument("-sv", "--std_vector", default="std.npy",
                        help="path to output standard deviation vector")
    parser.add_argument("-l", "--log2", default="Log2.post",
                        choices=["Log2.post", "Log2.pre", "Log2.none"],
                        help="Decided if and when to log transform counts")
    parser.add_argument("-k", "--kmer", default=6,
                        help="length of kmers you want to count")
    args = _parse_args_or_exit(parser, argv)
    _enable_xla_cache()
    _run_norm_vectors(args.fasta, args.mean_vector, args.std_vector,
                      args.log2, int(args.kmer))


# -- find_dist ---------------------------------------------------------------

def console_find_dist(argv=None):
    from seekr_tpu.stats import find_dist

    parser = argparse.ArgumentParser(usage=FIND_DIST_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("fasta", help="Background fasta path, or 'default'.")
    parser.add_argument("-k", "--kmer", default=4,
                        help="length of kmers you want to count.")
    parser.add_argument("-l", "--log2", default="Log2.post",
                        choices=["Log2.post", "Log2.pre", "Log2.none"],
                        help="decided if and when to log transform counts")
    parser.add_argument("-mdl", "--models", default="common10",
                        help="'all', 'common10', or comma-separated scipy "
                             "distribution names (e.g. 'norm,expon,pareto').")
    parser.add_argument("-sbt", "--subsetting", action="store_true",
                        help="use a subset of the data for fitting/output.")
    parser.add_argument("-sbs", "--subset_size", default=100000,
                        help="subset size when --subsetting is set.")
    parser.add_argument("-fm", "--fit_model", action="store_true",
                        help="fit the data to the --models distributions.")
    parser.add_argument("-statm", "--statsmethod", default="ks",
                        choices=["ks", "mse", "aic", "bic"],
                        help="goodness-of-fit statistic.")
    parser.add_argument("-pb", "--progress_bar", action="store_true",
                        help="show a progress bar while fitting.")
    parser.add_argument("-pf", "--plotfit", default=None,
                        help="path to save the fit grid plot (pdf appended).")
    parser.add_argument("-o", "--outputname", default=None,
                        help="path to save results csv (csv appended).")
    parser.add_argument("-nj", "--n_jobs", default=1,
                        help="host processes for distribution fitting "
                             "(extension; useful with -mdl all).")
    # short flag is -fto, NOT -ft: the sibling seekr_find_pval binds -ft to
    # --fitres_type (reference flag family), and colliding habits would turn
    # "-ft distribution" into a float-parse crash here
    parser.add_argument("-fto", "--fit_timeout", default=None, type=float,
                        help="per-distribution fit timeout in seconds; a "
                             "timed-out fit is skipped like any failed fit "
                             "(extension; guards -mdl all against "
                             "pathological scipy MLEs).")
    parser.add_argument("-dp", "--data_parallel", default=None, type=int,
                        help="devices on the mesh 'data' axis for the "
                             "O(m^2) background Pearson (extension).")
    parser.add_argument("-kp", "--kmer_parallel", default=1, type=int,
                        help="devices on the mesh 'kmer' axis (extension).")
    args = _parse_args_or_exit(parser, argv)

    _enable_xla_cache()
    if args.models not in ("common10", "all"):
        modelslist = args.models.split(",")
    else:
        modelslist = args.models
    find_dist(args.fasta, int(args.kmer), args.log2, modelslist,
              args.subsetting, int(args.subset_size), args.fit_model,
              args.statsmethod, args.progress_bar, args.plotfit,
              args.outputname, n_jobs=int(args.n_jobs),
              fit_timeout=args.fit_timeout,
              data_parallel=args.data_parallel,
              kmer_parallel=args.kmer_parallel)


# -- find_pval ---------------------------------------------------------------

def parse_fitres_csv(fitres_file, fitres_type):
    """Reload a find_dist artifact: distribution-list csv or raw r csv.

    The distribution branch re-parses the stringified params tuple back into
    floats (reference console_scripts.py:862-872).
    """
    import numpy as np
    import pandas as pd

    if fitres_type == "distribution":
        fitres = pd.read_csv(fitres_file)
        fitres = [tuple(row) for row in fitres.values]
        return [(row[0], row[1],
                 tuple(map(float, row[2][1:-1].split(","))))
                for row in fitres]
    return np.loadtxt(fitres_file, delimiter=",")


def console_find_pval(argv=None):
    from seekr_tpu.stats import find_pval

    parser = argparse.ArgumentParser(usage=FIND_PVAL_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("seq1file", help="fasta file of input sequence 1.")
    parser.add_argument("seq2file",
                        help="fasta file of input sequence 2 (may equal 1).")
    parser.add_argument("mean_path", help="normalization mean vector (.npy).")
    parser.add_argument("std_path", help="normalization std vector (.npy).")
    parser.add_argument("kmer", help="k-mer length (must match the vectors).")
    parser.add_argument("fitres_file", help="csv output of seekr_find_dist.")
    parser.add_argument("-ft", "--fitres_type", default="distribution",
                        choices=["distribution", "npy"],
                        help="type of the fitres artifact.")
    parser.add_argument("-l", "--log2", default="Log2.post",
                        choices=["Log2.post", "Log2.pre", "Log2.none"],
                        help="decided if and when to log transform counts")
    parser.add_argument("-bf", "--bestfit", default=1,
                        help="1-based index of the distribution to use.")
    parser.add_argument("-o", "--outputname", default=None,
                        help="path to save p-value csv (csv appended).")
    parser.add_argument("-pb", "--progress_bar", action="store_true",
                        help="show a progress bar during calculation.")
    parser.add_argument("-bo", "--binary_outfile", default=None,
                        help="also write the p-value matrix as a float32 "
                             ".npy artifact (extension; the input "
                             "seekr_adj_pval -bi corrects at extreme "
                             "scale).")
    parser.add_argument("--stream", default=None,
                        choices=["auto", "on", "off"],
                        help="stream the p-value matrix tile-by-tile to "
                             "the output artifacts instead of holding it "
                             "in memory (extension; 'auto' streams above "
                             "64M cells — at that size nothing is "
                             "returned, only written).")
    parser.add_argument("-dp", "--data_parallel", default=None, type=int,
                        help="devices on the mesh 'data' axis for the "
                             "O(m1*m2) Pearson (extension; combines with "
                             "--stream).")
    args = _parse_args_or_exit(parser, argv)

    _enable_xla_cache()
    fitres = parse_fitres_csv(args.fitres_file, args.fitres_type)
    stream = {None: None, "auto": None, "on": True, "off": False}[args.stream]
    find_pval(args.seq1file, args.seq2file, args.mean_path, args.std_path,
              int(args.kmer), fitres, args.log2, int(args.bestfit),
              args.outputname, args.progress_bar, stream=stream,
              npy_out=args.binary_outfile,
              data_parallel=args.data_parallel)


# -- adj_pval ----------------------------------------------------------------

def console_adj_pval(argv=None):
    import pandas as pd

    from seekr_tpu.stats import adj_pval

    parser = argparse.ArgumentParser(usage=ADJ_PVAL_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("pval_path",
                        help="csv of p-values (output of seekr_find_pval).")
    parser.add_argument("method",
                        help="correction method: bonferroni, sidak, "
                             "holm-sidak, holm, simes-hochberg, hommel, "
                             "fdr_bh, fdr_by, fdr_tsbh, fdr_tsbky.")
    parser.add_argument("-a", "--alpha", default=0.05,
                        help="desired family-wise error rate.")
    parser.add_argument("-o", "--outputname", default=None,
                        help="path to save adjusted csv (csv appended).")
    parser.add_argument("-bi", "--binary_input", action="store_true",
                        help="pval_path is a .npy artifact "
                             "(seekr_find_pval -bo); the correction then "
                             "STREAMS with bounded memory — required at "
                             "extreme scale where the csv matrix cannot "
                             "be held in RAM (extension).")
    parser.add_argument("-bo", "--binary_outfile", default=None,
                        help="also write the corrected float64 matrix as "
                             ".npy (extension; -bi mode only).")
    parser.add_argument("--symmetric", default="auto",
                        choices=["auto", "yes", "no"],
                        help="-bi mode only (extension): force the "
                             "upper-triangle (yes) or full-matrix (no) "
                             "correction instead of the 5-decimal "
                             "transpose auto-detection.  Use 'yes' for "
                             "STREAMED self-pval artifacts at extreme "
                             "scale, whose tile-wise writers cannot "
                             "mirror to exact symmetry (PARITY.md); "
                             "also skips the detection's full extra "
                             "read of the artifact.")
    args = _parse_args_or_exit(parser, argv)

    if args.binary_input:
        from seekr_tpu.stats.stream_adj import adj_pval_stream

        adj_pval_stream(args.pval_path, args.method, float(args.alpha),
                        outputname=args.outputname,
                        out_npy=args.binary_outfile,
                        symmetric={"auto": None, "yes": True,
                                   "no": False}[args.symmetric])
        return
    if args.binary_outfile:
        parser.error("-bo requires -bi (the streamed binary path)")
    if args.symmetric != "auto":
        parser.error("--symmetric requires -bi (the in-memory path keeps "
                     "the reference's auto-detection contract)")
    pvals = pd.read_csv(args.pval_path, header=0, index_col=0)
    adj_pval(pvals, args.method, float(args.alpha), args.outputname)


# -- kmer_heatmap ------------------------------------------------------------

def console_kmer_heatmap(argv=None):
    import pandas as pd

    from seekr_tpu.viz import kmer_heatmap

    parser = argparse.ArgumentParser(usage=KMER_HEATMAP_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("df_file", help="csv matrix with row/column names.")
    parser.add_argument("datamin", help="minimum possible data value.")
    parser.add_argument("datamax", help="maximum possible data value.")
    parser.add_argument("-th", "--thresh_value", default=0.05,
                        help="middle-color pivot for 3-color palettes.")
    parser.add_argument("-cr", "--color_range_str",
                        default="#1b7837,#ffffff,#c51b7d",
                        help="comma-separated 2 or 3 hex colors.")
    parser.add_argument("-cl", "--cluster", action="store_true",
                        help="cluster and draw dendrograms on rows+columns.")
    parser.add_argument("-distm", "--distmetric", default="correlation",
                        help="distance metric for clustering.")
    parser.add_argument("-linkm", "--linkmethod", default="complete",
                        help="linkage method for clustering.")
    parser.add_argument("-wratio", "--hmapw_ratio", default=0.3,
                        help="heatmap width ratio factor.")
    parser.add_argument("-hratio", "--hmaph_ratio", default=0.3,
                        help="heatmap height ratio factor.")
    parser.add_argument("-xts", "--x_tick_size", default=16,
                        help="column label font size.")
    parser.add_argument("-yts", "--y_tick_size", default=16,
                        help="row label font size.")
    parser.add_argument("-cfs", "--cbar_font_size", default=16,
                        help="colorbar tick font size.")
    parser.add_argument("-o", "--outputname", default="test_kmer_heatmap",
                        help="output path/name.")
    parser.add_argument("-hf", "--hformat", default="pdf",
                        help="output format.")
    parser.add_argument("-hd", "--hdpi", default=300, help="output dpi.")
    args = _parse_args_or_exit(parser, argv)

    df = pd.read_csv(args.df_file, index_col=0)
    kmer_heatmap(df, int(args.datamin), int(args.datamax),
                 float(args.thresh_value), args.color_range_str.split(","),
                 args.cluster, args.distmetric, args.linkmethod,
                 float(args.hmapw_ratio), float(args.hmaph_ratio),
                 int(args.x_tick_size), int(args.y_tick_size),
                 int(args.cbar_font_size), args.outputname, args.hformat,
                 int(args.hdpi))


# -- kmer_dendrogram ---------------------------------------------------------

def console_kmer_dendrogram(argv=None):
    import pandas as pd

    from seekr_tpu.viz import kmer_dendrogram

    parser = argparse.ArgumentParser(usage=KMER_DENDROGRAM_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("df_file", help="csv matrix with row/column names.")
    parser.add_argument("-dd", "--dendro_direct", default="row",
                        choices=["row", "column"],
                        help="clustering direction.")
    parser.add_argument("-distm", "--distmetric", default="correlation",
                        help="distance metric.")
    parser.add_argument("-linkm", "--linkmethod", default="complete",
                        help="linkage method.")
    parser.add_argument("-ph", "--plot_ht", default=8, help="plot height.")
    parser.add_argument("-wratio", "--wd_ratio", default=0.5,
                        help="width ratio factor.")
    parser.add_argument("-lfs", "--leaf_font_size", default=16,
                        help="leaf label font size.")
    parser.add_argument("-o", "--outputname", default="test_kmer_dendrogram",
                        help="output path/name.")
    parser.add_argument("-pf", "--pformat", default="pdf",
                        help="output format.")
    parser.add_argument("-d", "--pdpi", default=300, help="output dpi.")
    args = _parse_args_or_exit(parser, argv)

    df = pd.read_csv(args.df_file, index_col=0)
    kmer_dendrogram(df, args.dendro_direct, args.distmetric, args.linkmethod,
                    int(args.plot_ht), float(args.wd_ratio),
                    int(args.leaf_font_size), args.outputname, args.pformat,
                    int(args.pdpi))


# -- kmer_leiden -------------------------------------------------------------

def console_kmer_leiden(argv=None):
    from seekr_tpu.graph import kmer_leiden

    parser = argparse.ArgumentParser(usage=KMER_LEIDEN_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("fasta", help="fasta file with unique headers.")
    parser.add_argument("mean_path", help="normalization mean vector (.npy).")
    parser.add_argument("std_path", help="normalization std vector (.npy).")
    parser.add_argument("kmer", help="k-mer length (must match the vectors).")
    parser.add_argument("-a", "--algo", default="RBERVertexPartition",
                        choices=["ModularityVertexPartition",
                                 "RBConfigurationVertexPartition",
                                 "RBERVertexPartition", "CPMVertexPartition",
                                 "SurpriseVertexPartition",
                                 "SignificanceVertexPartition"],
                        help="Leiden partition quality function.")
    parser.add_argument("-r", "--rs", default=1.0,
                        help="resolution parameter.")
    parser.add_argument("-pco", "--pearsoncutoff", default=0.0,
                        help="zero out r values below this cutoff.")
    parser.add_argument("-sd", "--setseed", action="store_true",
                        help="set seed for reproducible communities.")
    parser.add_argument("-ec", "--edgecolormethod", default="gradient",
                        choices=["gradient", "threshold"],
                        help="edge coloring method.")
    parser.add_argument("-et", "--edgethreshold", default=0.1,
                        help="threshold for -ec threshold.")
    parser.add_argument("-lfs", "--labelfontsize", default=12,
                        help="node label font size.")
    parser.add_argument("-pn", "--plotname", default=None,
                        help="plot output path (pdf appended).")
    parser.add_argument("-cf", "--csvfile", default=None,
                        help="Gephi nodes/edges csv prefix.")
    parser.add_argument("--stream", default=None,
                        choices=["auto", "on", "off"],
                        help="extract the thresholded edge set tile-by-"
                             "tile instead of materializing the [m, m] "
                             "similarity matrix (extension; 'auto' "
                             "streams above ~2.5B cells, m~50k — the "
                             "spring plot is skipped, Gephi CSVs hold "
                             "the detected edges).")
    parser.add_argument("-dp", "--data_parallel", default=None, type=int,
                        help="devices on the mesh 'data' axis for the "
                             "O(m^2) similarity GEMM (extension; implies "
                             "streamed edge extraction).")
    args = _parse_args_or_exit(parser, argv)

    _enable_xla_cache()
    stream = {None: None, "auto": None, "on": True, "off": False}[args.stream]
    kmer_leiden(args.fasta, args.mean_path, args.std_path, int(args.kmer),
                args.algo, float(args.rs), float(args.pearsoncutoff),
                args.setseed, args.edgecolormethod, float(args.edgethreshold),
                int(args.labelfontsize), args.plotname, args.csvfile,
                stream=stream, data_parallel=args.data_parallel)


# -- kmer_count_barplot ------------------------------------------------------

def console_kmer_count_barplot(argv=None):
    from seekr_tpu.viz import kmer_count_barplot

    parser = argparse.ArgumentParser(usage=KMER_COUNT_BARPLOT_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("fasta", help="fasta file (first 10 sequences used).")
    parser.add_argument("mean_path", help="normalization mean vector (.npy).")
    parser.add_argument("std_path", help="normalization std vector (.npy).")
    parser.add_argument("kmer", help="k-mer length (must match the vectors).")
    parser.add_argument("-l", "--log2", default="Log2.post",
                        choices=["Log2.post", "Log2.pre", "Log2.none"],
                        help="decided if and when to log transform counts")
    parser.add_argument("-sm", "--sortmethod", default="ascending",
                        choices=["ascending", "descending"],
                        help="sort order of summed |diff from column mean|.")
    parser.add_argument("-tn", "--topkmernumber", default=10,
                        help="number of k-mer words to plot.")
    parser.add_argument("-xls", "--xlabelsize", default=20,
                        help="x axis label font size.")
    parser.add_argument("-yls", "--ylabelsize", default=20,
                        help="y axis label font size.")
    parser.add_argument("-xts", "--xticksize", default=20,
                        help="x tick label font size.")
    parser.add_argument("-yts", "--yticksize", default=20,
                        help="y tick label font size.")
    parser.add_argument("-ls", "--legendsize", default=12,
                        help="legend font size.")
    parser.add_argument("-o", "--outputname",
                        default="test_kmer_count_barplot",
                        help="output path/name.")
    parser.add_argument("-pf", "--pformat", default="pdf",
                        help="output format.")
    parser.add_argument("-d", "--pdpi", default=300, help="output dpi.")
    args = _parse_args_or_exit(parser, argv)

    _enable_xla_cache()
    kmer_count_barplot(args.fasta, args.mean_path, args.std_path,
                       int(args.kmer), args.log2, args.sortmethod,
                       int(args.topkmernumber), int(args.xlabelsize),
                       int(args.ylabelsize), int(args.xticksize),
                       int(args.yticksize), int(args.legendsize),
                       args.outputname, args.pformat, int(args.pdpi))


# -- kmer_msd_barplot --------------------------------------------------------

def console_kmer_msd_barplot(argv=None):
    from seekr_tpu.viz import kmer_msd_barplot

    parser = argparse.ArgumentParser(usage=KMER_MSD_BARPLOT_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("fasta", help="fasta file with unique headers.")
    parser.add_argument("mean_path", help="normalization mean vector (.npy).")
    parser.add_argument("std_path", help="normalization std vector (.npy).")
    parser.add_argument("kmer", help="k-mer length (must match the vectors).")
    parser.add_argument("-l", "--log2", default="Log2.post",
                        choices=["Log2.post", "Log2.pre", "Log2.none"],
                        help="decided if and when to log transform counts")
    parser.add_argument("-ss", "--sortstat", default="mean",
                        choices=["mean", "sd"], help="sort statistic.")
    parser.add_argument("-sm", "--sortmethod", default="descending",
                        choices=["ascending", "descending"],
                        help="sort order.")
    parser.add_argument("-tn", "--topkmernumber", default=10,
                        help="number of k-mer words to plot.")
    parser.add_argument("-xls", "--xlabelsize", default=20,
                        help="x axis label font size.")
    parser.add_argument("-yls", "--ylabelsize", default=20,
                        help="y axis label font size.")
    parser.add_argument("-xts", "--xticksize", default=20,
                        help="x tick label font size.")
    parser.add_argument("-yts", "--yticksize", default=20,
                        help="y tick label font size.")
    parser.add_argument("-o", "--outputname", default="test_kmer_msd_barplot",
                        help="output path/name.")
    parser.add_argument("-pf", "--pformat", default="pdf",
                        help="output format.")
    parser.add_argument("-d", "--pdpi", default=300, help="output dpi.")
    args = _parse_args_or_exit(parser, argv)

    _enable_xla_cache()
    kmer_msd_barplot(args.fasta, args.mean_path, args.std_path,
                     int(args.kmer), args.log2, args.sortstat,
                     args.sortmethod, int(args.topkmernumber),
                     int(args.xlabelsize), int(args.ylabelsize),
                     int(args.xticksize), int(args.yticksize),
                     args.outputname, args.pformat, int(args.pdpi))


# -- kmer_comp_textplot ------------------------------------------------------

def console_kmer_comp_textplot(argv=None):
    from seekr_tpu.viz import kmer_comp_textplot

    parser = argparse.ArgumentParser(usage=KMER_COMP_TEXTPLOT_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("seq1file", help="first fasta (first sequence used).")
    parser.add_argument("seq2file", help="second fasta (first sequence used).")
    parser.add_argument("words_str",
                        help="comma-separated words, e.g. 'ATTA,AAAA,ACTC' "
                             "(max 10).")
    parser.add_argument("-cv", "--color_vec_str", default="default",
                        help="comma-separated hex colors matching words, or "
                             "'default'.")
    parser.add_argument("-wl", "--wraplen", default=60,
                        help="characters per line.")
    parser.add_argument("-cs", "--char_spacing", default=1.0,
                        help="space between characters.")
    parser.add_argument("-ls", "--line_spacing", default=0.5,
                        help="space between seq1, seq2 and ruler lines.")
    parser.add_argument("-sfs", "--seqfontsize", default=28,
                        help="sequence character font size.")
    parser.add_argument("-nfs", "--numfontsize", default=18,
                        help="position number font size.")
    parser.add_argument("-cbh", "--colorblockh", default=0.5,
                        help="highlight block height.")
    parser.add_argument("-o", "--outputname", default="comp_textplot",
                        help="output path/name.")
    parser.add_argument("-pf", "--plotformat", default="pdf",
                        help="output format.")
    parser.add_argument("-d", "--plotdpi", default=300, help="output dpi.")
    args = _parse_args_or_exit(parser, argv)

    words = args.words_str.split(",")
    color_vec = ("default" if args.color_vec_str == "default"
                 else args.color_vec_str.split(","))
    kmer_comp_textplot(args.seq1file, args.seq2file, words, color_vec,
                       int(args.wraplen), float(args.char_spacing),
                       float(args.line_spacing), int(args.seqfontsize),
                       int(args.numfontsize), float(args.colorblockh),
                       args.outputname, args.plotformat, int(args.plotdpi))


# -- kmer_indi_textplot ------------------------------------------------------

def console_kmer_indi_textplot(argv=None):
    from seekr_tpu.viz import kmer_indi_textplot

    parser = argparse.ArgumentParser(usage=KMER_INDI_TEXTPLOT_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("seqfile", help="input fasta file.")
    parser.add_argument("words_str",
                        help="comma-separated words, e.g. 'ATTA,AAAA,ACTC' "
                             "(max 10).")
    parser.add_argument("-cv", "--color_vec_str", default="default",
                        help="comma-separated hex colors matching words, or "
                             "'default'.")
    parser.add_argument("-wl", "--wraplen", default=60,
                        help="characters per line.")
    parser.add_argument("-cs", "--char_spacing", default=1.0,
                        help="space between characters.")
    parser.add_argument("-ls", "--line_spacing", default=0.5,
                        help="space between sequence and ruler lines.")
    parser.add_argument("-sfs", "--seqfontsize", default=28,
                        help="sequence character font size.")
    parser.add_argument("-nfs", "--numfontsize", default=18,
                        help="position number font size.")
    parser.add_argument("-cbh", "--colorblockh", default=0.5,
                        help="highlight block height.")
    parser.add_argument("-op", "--outputpath", default="",
                        help="output directory; plot names come from "
                             "headers.")
    parser.add_argument("-pf", "--plotformat", default="pdf",
                        help="output format.")
    parser.add_argument("-d", "--plotdpi", default=300, help="output dpi.")
    args = _parse_args_or_exit(parser, argv)

    words = args.words_str.split(",")
    color_vec = ("default" if args.color_vec_str == "default"
                 else args.color_vec_str.split(","))
    kmer_indi_textplot(args.seqfile, words, color_vec, int(args.wraplen),
                       float(args.char_spacing), float(args.line_spacing),
                       int(args.seqfontsize), int(args.numfontsize),
                       float(args.colorblockh), args.outputpath,
                       args.plotformat, int(args.plotdpi))


# -- pipeline (extension) ----------------------------------------------------

def console_pipeline(argv=None):
    from seekr_tpu.models.workflow import run_workflow

    parser = argparse.ArgumentParser(usage=PIPELINE_DOC,
                                     formatter_class=_formatter())
    parser.add_argument("seq1file", help="query fasta (rows of the output).")
    parser.add_argument("-s2", "--seq2file", default=None,
                        help="second fasta (columns); default: seq1file.")
    parser.add_argument("-b", "--background", required=True,
                        help="background fasta for norm vectors + null.")
    parser.add_argument("-k", "--kmer", default=6, help="k-mer length.")
    parser.add_argument("-l", "--log2", default="Log2.post",
                        choices=["Log2.post", "Log2.pre", "Log2.none"],
                        help="log2 transform mode.")
    parser.add_argument("-m", "--method", default="fdr_bh",
                        help="multiple-comparison correction method.")
    parser.add_argument("-a", "--alpha", default=0.05,
                        help="family-wise error rate.")
    parser.add_argument("-sbs", "--subset_size", default=100000,
                        help="max null-sample size.")
    parser.add_argument("-sd", "--seed", default=None,
                        help="seed for null subsampling.")
    parser.add_argument("-o", "--outdir", default="seekr_out",
                        help="artifact output directory.")
    parser.add_argument("--leiden", action="store_true",
                        help="append Leiden community detection on the "
                             "query self-similarity graph (native engine); "
                             "writes communities.csv.")
    parser.add_argument("-lc", "--leiden_cutoff", default=0.0,
                        help="edge threshold: r below this becomes 0 "
                             "(kmer_leiden pearsoncutoff semantics).")
    parser.add_argument("-la", "--leiden_algo",
                        default="RBERVertexPartition",
                        help="leidenalg partition algorithm name.")
    parser.add_argument("-lr", "--leiden_resolution", default=1.0,
                        help="resolution for RBConfig/RBER/CPM partitions.")
    parser.add_argument("-dp", "--data_parallel", default=None, type=int,
                        help="devices on the mesh 'data' axis; >1 routes "
                             "the O(m^2) Pearson stages through the "
                             "data-sharded streaming GEMM (extension).")
    parser.add_argument("-kp", "--kmer_parallel", default=1, type=int,
                        help="devices on the mesh 'kmer' axis (extension).")
    parser.add_argument("--coordinator", default=None,
                        help="host0 address for multi-host bootstrap, e.g. "
                             "host0:8476 (extension).")
    parser.add_argument("--num_processes", default=None, type=int,
                        help="total processes for multi-host bootstrap "
                             "(extension).")
    parser.add_argument("--process_id", default=None, type=int,
                        help="this process's id for multi-host bootstrap "
                             "(extension).")
    args = _parse_args_or_exit(parser, argv)
    _enable_xla_cache()
    run_workflow(args.seq1file, args.seq2file, args.background,
                 k=int(args.kmer), log2=args.log2, adj_method=args.method,
                 alpha=float(args.alpha), outdir=args.outdir,
                 subset_size=int(args.subset_size),
                 seed=None if args.seed is None else int(args.seed),
                 leiden=args.leiden,
                 leiden_cutoff=float(args.leiden_cutoff),
                 leiden_algo=args.leiden_algo,
                 leiden_resolution=float(args.leiden_resolution),
                 data_parallel=args.data_parallel,
                 kmer_parallel=args.kmer_parallel,
                 coordinator=args.coordinator,
                 num_processes=args.num_processes,
                 process_id=args.process_id)


# -- seekr help --------------------------------------------------------------

def _entry_commands():
    """Entry-point name -> console function, in manual order.

    Defined lazily (the console functions live above in this module) so
    the table can never go stale against COMMANDS below.
    """
    return {
        "seekr_download_gencode": console_download_gencode,
        "seekr_filter_gencode": console_filter_gencode,
        "seekr_norm_vectors": console_norm_vectors,
        "seekr_kmer_counts": console_kmer_counts,
        "seekr_pearson": console_pearson,
        "seekr_find_dist": console_find_dist,
        "seekr_find_pval": console_find_pval,
        "seekr_adj_pval": console_adj_pval,
        "seekr_kmer_heatmap": console_kmer_heatmap,
        "seekr_kmer_dendrogram": console_kmer_dendrogram,
        "seekr_kmer_leiden": console_kmer_leiden,
        "seekr_kmer_count_barplot": console_kmer_count_barplot,
        "seekr_kmer_msd_barplot": console_kmer_msd_barplot,
        "seekr_kmer_comp_textplot": console_kmer_comp_textplot,
        "seekr_kmer_indi_textplot": console_kmer_indi_textplot,
        "seekr_gen_rand_rnas": console_gen_rand_rnas,
        "seekr_pwms": console_pwms,
        "seekr_graph": console_graph,
        "seekr_domain_pearson": console_domain_pearson,
        "seekr_visualize_distro": console_visualize_distro,
        "seekr_canonical_gencode": console_canonical_gencode,
        "seekr_tpu_pipeline": console_pipeline,
        "seekr_tpu_serve": console_serve,
        "seekr_tpu_query": console_query,
        "seekr_tpu_doctor": console_doctor,
    }


def _run_console_seekr_help(version):
    """Print the complete manual: every command's doc + full flag table.

    The reference's ``seekr`` command dumps rich per-command usage docs
    (seekr/console_scripts.py:1355-1399 over :24-517).  Here each
    command's harvested argparse parser renders its own help — the doc
    text (usage=) plus EVERY positional and flag with its default
    (ArgumentDefaultsHelpFormatter) — so the manual is strictly complete
    and can never drift from the actual CLI surface.
    """
    if version:
        print(__version__)
        sys.exit()
    print(f"Welcome to seekr_tpu! ({__version__})\n"
          "A TPU-native k-mer sequence-analysis framework with the seekr "
          "command set.\nBelow is the full manual: every command with its "
          "complete argument and default table.\n")
    for cmd, fn in _entry_commands().items():
        try:
            parser = _collect_parser(fn)
        except Exception as err:  # e.g. one command's import chain broke
            # one broken command must not take down the whole manual
            print(f"{'=' * 25}\n{cmd}\n{'=' * 25}\n"
                  f"  (flag table unavailable here: {type(err).__name__}: "
                  f"{err};\n   run `{cmd} --help` for details)\n")
            continue
        parser.prog = cmd
        print(f"{'=' * 25}\n{cmd}\n{'=' * 25}\n{parser.format_help()}")
    print("Each section above is identical to running the command with "
          "no parameters (or --help).")


def console_seekr_help(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-v", "--version", action="store_true",
                        help="Print current version and exit.")
    args = parser.parse_args(sys.argv[1:] if argv is None else argv)
    _run_console_seekr_help(args.version)


# -- module dispatcher (python -m seekr_tpu.cli <command> ...) ---------------

COMMANDS = {
    "download_gencode": console_download_gencode,
    "filter_gencode": console_filter_gencode,
    "kmer_counts": console_kmer_counts,
    "pearson": console_pearson,
    "norm_vectors": console_norm_vectors,
    "find_dist": console_find_dist,
    "find_pval": console_find_pval,
    "adj_pval": console_adj_pval,
    "kmer_heatmap": console_kmer_heatmap,
    "kmer_dendrogram": console_kmer_dendrogram,
    "kmer_leiden": console_kmer_leiden,
    "kmer_count_barplot": console_kmer_count_barplot,
    "kmer_msd_barplot": console_kmer_msd_barplot,
    "kmer_comp_textplot": console_kmer_comp_textplot,
    "kmer_indi_textplot": console_kmer_indi_textplot,
    "gen_rand_rnas": console_gen_rand_rnas,
    "pwms": console_pwms,
    "graph": console_graph,
    "domain_pearson": console_domain_pearson,
    "visualize_distro": console_visualize_distro,
    "canonical_gencode": console_canonical_gencode,
    "pipeline": console_pipeline,
    "serve": console_serve,
    "query": console_query,
    "doctor": console_doctor,
    "help": console_seekr_help,
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m seekr_tpu.cli <command> [args...]\n")
        print("commands:", ", ".join(COMMANDS))
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd}")
        print("commands:", ", ".join(COMMANDS))
        return 2
    COMMANDS[cmd](argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
