from smilecode_tpu.utils.meters import AverageMeter
from smilecode_tpu.utils.logging import Logger, MetricsWriter
from smilecode_tpu.utils.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint

__all__ = [
    "AverageMeter",
    "Logger",
    "MetricsWriter",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
]
