from .metrics import RecallMeter, interval_iou
from .evaluator import Evaluator

__all__ = ["RecallMeter", "interval_iou", "Evaluator"]
