from seekr_tpu.utils.progress import my_tqdm, my_trange
from seekr_tpu.utils.logging import get_logger, stage_timer

__all__ = ["my_tqdm", "my_trange", "get_logger", "stage_timer"]
