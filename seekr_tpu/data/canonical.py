"""Header-pattern canonical filter (legacy ``seekr_canonical_gencode``).

Reconstructs the legacy 1.x command the reference replaced in its 2.0
rewrite (CHANGELOG 1.3.0 "seekr_canonical_gencode command line script
filters for -001 transcripts"): old GENCODE releases numbered each
gene's isoforms ``-001``, ``-002``, ... with ``-001`` the primary
transcript, so keeping headers whose transcript-name field ends in
``-001`` approximated one-isoform-per-gene.  Its modern successor is
``filter_gencode``'s GTF-driven ``Ensembl_canonical`` filter
(data/filter_gencode.py), which current releases require; this command
needs no GTF and still works on old-style fastas.

Reconstruction choices (no shipped tests pin the legacy surface): the
transcript name is taken from the 5th ``|``-field of a GENCODE header
when present (e.g. ``DDX11L1-202``), else from the whole header; the
``zeros`` knob generalizes the suffix to ``-0{zeros}1`` mirroring the
legacy CLI's ``-z/--zeros`` flag.
"""

from __future__ import annotations

from seekr_tpu.io.fasta import Reader


def canonical_gencode(in_fasta: str, out_fasta: str, zeros: int = 2) -> int:
    """Write records whose transcript name ends in ``-0..01`` (``zeros``
    zeros); returns the number kept."""
    suffix = "-" + "0" * int(zeros) + "1"
    reader = Reader(in_fasta)
    headers = reader.get_headers()
    seqs = reader.get_seqs()
    kept = 0
    with open(out_fasta, "w") as fh:
        for header, seq in zip(headers, seqs):
            fields = header.lstrip(">").split("|")
            name = fields[4] if len(fields) > 4 and fields[4] else fields[0]
            if name.endswith(suffix):
                fh.write(f"{header}\n{seq}\n")
                kept += 1
    if kept == 0:
        print(f"No transcript names ended in '{suffix}'. Note that current "
              "GENCODE releases no longer use -001 numbering; use "
              "seekr_filter_gencode with a GTF for Ensembl_canonical "
              "filtering.")
    return kept
