from .timers import AverageMeter, StageTimer
from .logger import Logger

__all__ = ["AverageMeter", "StageTimer", "Logger"]
