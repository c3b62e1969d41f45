from seekr_tpu.ops.count import count_kmers_device, count_kmers_host
from seekr_tpu.ops.normalize import normalize_counts
from seekr_tpu.ops.pearson import pearson_device

__all__ = [
    "count_kmers_device",
    "count_kmers_host",
    "normalize_counts",
    "pearson_device",
]
