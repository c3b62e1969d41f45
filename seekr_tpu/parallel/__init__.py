from seekr_tpu.parallel.mesh import (make_mesh, data_sharding,
                                     row_col_sharding, replicated)
from seekr_tpu.parallel.dist import (
    distributed_pipeline,
    distributed_norm_stats,
    count_long_sequence,
    init_distributed,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "row_col_sharding",
    "replicated",
    "distributed_pipeline",
    "distributed_norm_stats",
    "count_long_sequence",
    "init_distributed",
]
