from .logging import Logger, AverageMeter, time_str, easy_reduce
from .profiling import PhaseTimer, annotate, trace

__all__ = ["Logger", "AverageMeter", "time_str", "easy_reduce",
           "PhaseTimer", "annotate", "trace"]
