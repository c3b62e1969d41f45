from seekr_tpu.models.counter import KmerCounter, BasicCounter, Log2, make_count_file
from seekr_tpu.models.domain import DomainPearson
from seekr_tpu.models.pearson import pearson
from seekr_tpu.models.pipeline import SeekrPipeline

__all__ = ["KmerCounter", "BasicCounter", "Log2", "make_count_file", "pearson", "SeekrPipeline", "DomainPearson"]
