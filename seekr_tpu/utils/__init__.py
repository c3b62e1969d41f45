from seekr_tpu.utils.progress import my_tqdm, my_trange
from seekr_tpu.utils.logging import get_logger, stage_timer
from seekr_tpu.utils.profiler import profile_region, trace_session
from seekr_tpu.utils.adj import get_adj

__all__ = ["my_tqdm", "my_trange", "get_logger", "stage_timer",
           "profile_region", "trace_session", "get_adj"]
