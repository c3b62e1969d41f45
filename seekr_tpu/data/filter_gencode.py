"""Filter a GENCODE fasta by length / canonical tag / isoform / duplicates.

Behavioral parity with seekr/filter_gencode.py:114-225:

  * header length field = ``header.split('|')[-2]`` (GENCODE format)
  * canonical: keep transcripts whose GTF line (feature 'transcript') carries
    a ``tag ... Ensembl_canonical`` attribute
  * isoform: keep transcripts whose 3-digit transcript_name suffix fully
    matches the (regex-capable) isoform string
  * >50 GTF ids unmatched to fasta headers -> advisory warning
  * rm_dup: exact-duplicate sequences removed, first occurrence kept
  * writes ``{outputname}.fa`` and returns (headers, seqs) with '>' stripped
"""

from __future__ import annotations

import re

from seekr_tpu.io.fasta import Reader


def _parse_attributes(field: str):
    """9th-column GTF attribute string -> list of (key, value) pairs."""
    pairs = []
    for kv in field.split(";"):
        kv = kv.strip()
        if not kv:
            continue
        try:
            key, value = kv.split(None, 1)
        except ValueError:
            continue
        pairs.append((key, value.strip(' "')))
    return pairs


def get_transcript_id_with_ensembl_canonical(field: str) -> str:
    """transcript_id if the attributes carry an Ensembl_canonical tag.

    Empty string otherwise (seekr/filter_gencode.py:57-79).
    """
    transcript_id = None
    canonical = False
    for key, value in _parse_attributes(field):
        if key == "transcript_id":
            transcript_id = value
        if key == "tag" and "Ensembl_canonical" in value:
            canonical = True
    return transcript_id if canonical else ""


def get_transcript_id_with_isoform(field: str, isoform: str) -> str:
    """transcript_id if the transcript_name's 3-digit suffix matches.

    ``isoform`` may be a regex (e.g. '[0-9]01'); full match required
    (seekr/filter_gencode.py:85-110).
    """
    transcript_id = None
    isoform_match = False
    for key, value in _parse_attributes(field):
        if key == "transcript_id":
            transcript_id = value
        if key == "transcript_name":
            iso = value.split("-")[-1]
            if iso.isdigit() and len(iso) == 3:
                isoform_match = bool(re.match(f"^{isoform}$", iso))
    return transcript_id if isoform_match else ""


def _warn_unmatched(gtf_ids, header_ids, what):
    if len(set(gtf_ids) - set(header_ids)) > 50:
        print(f"After {what} filtering on gtf, there are more than 50 "
              "transcript_ids in gtf file that cannot be matched to the "
              "input fasta headers.")
        print("Please make sure the provided gtf file and fasta file are "
              "from the same release and same species.")
        print("Please use gtf and fasta files directly from gencode, other "
              "formats are not tested.")


def filter_gencode(fasta_path, gtf_path=None, len_threshold=0,
                   canonical=False, isoform="0", rm_dup=False,
                   outputname="test"):
    reader = Reader(fasta_path)
    seqs = reader.get_seqs()
    headers = [h[1:] for h in reader.get_headers()]

    headers_list = [h.split("|") for h in headers]
    headers_tids = [h[0] for h in headers_list]
    headers_len = [int(h[-2]) for h in headers_list]

    if canonical or isoform != "0":
        if gtf_path is None:
            print("Please provide a gtf file path for filtering by "
                  "Ensemble_canonical tag and/or isoform number")
            return

        with open(gtf_path) as f:
            gtfs = [line.strip().split("\t") for line in f
                    if line and line[0] != "#"]
        gtfs = [line for line in gtfs if len(line) > 8 and line[2] == "transcript"]

        if canonical:
            tids = [get_transcript_id_with_ensembl_canonical(line[8])
                    for line in gtfs]
            tids = [t for t in tids if t != ""]
            tids_set = set(tids)
            presence = [tid in tids_set for tid in headers_tids]
            _warn_unmatched(tids_set, headers_tids, "Ensemble_canonical tag")
            headers = [h for h, p in zip(headers, presence) if p]
            seqs = [s for s, p in zip(seqs, presence) if p]
            headers_len = [n for n, p in zip(headers_len, presence) if p]
            headers_tids = [t for t, p in zip(headers_tids, presence) if p]
            gtfs = [g for g, p in zip(gtfs, presence) if p]

        if isoform != "0":
            itids = [get_transcript_id_with_isoform(line[8], isoform)
                     for line in gtfs]
            itids = [t for t in itids if t != ""]
            itids_set = set(itids)
            ipresence = [tid in itids_set for tid in headers_tids]
            _warn_unmatched(itids_set, headers_tids, "isoform")
            headers = [h for h, p in zip(headers, ipresence) if p]
            seqs = [s for s, p in zip(seqs, ipresence) if p]
            headers_len = [n for n, p in zip(headers_len, ipresence) if p]

    if len_threshold > 0:
        keep = [n >= len_threshold for n in headers_len]
        seqs = [s for s, p in zip(seqs, keep) if p]
        headers = [h for h, p in zip(headers, keep) if p]

    if rm_dup:
        seen = set()
        headers_uni, seqs_uni = [], []
        for seq, header in zip(seqs, headers):
            if seq not in seen:
                seen.add(seq)
                seqs_uni.append(seq)
                headers_uni.append(header)
        seqs, headers = seqs_uni, headers_uni

    with open(f"{outputname}.fa", "w") as f:
        for header, seq in zip(headers, seqs):
            f.write(f">{header}\n{seq}\n")

    return headers, seqs
