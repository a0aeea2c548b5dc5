from .logging import (Logger, AverageMeter, time_str, easy_reduce,
                      count_parameters)
from .profiling import PhaseTimer, annotate, trace
from .analysis import EvalResults, compute_iou_by_length
from .tracking import MetricsSink

__all__ = ["Logger", "AverageMeter", "time_str", "easy_reduce",
           "count_parameters",
           "PhaseTimer", "annotate", "trace",
           "EvalResults", "compute_iou_by_length", "MetricsSink"]
