from seekr_tpu.io.fasta import Reader
from seekr_tpu.io.encode import EncodedSeqs, encode_seqs, ALPHABET_AGTC

__all__ = ["Reader", "EncodedSeqs", "encode_seqs", "ALPHABET_AGTC"]
