from .batch_job import BatchJobRunner, new_batch_id
from .registry import BatchJobRecord, BatchRegistry, BatchStatus

__all__ = [
    "BatchJobRecord",
    "BatchJobRunner",
    "BatchRegistry",
    "BatchStatus",
    "new_batch_id",
]
