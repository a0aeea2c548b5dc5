from .logging import Logger, AverageMeter, time_str, easy_reduce

__all__ = ["Logger", "AverageMeter", "time_str", "easy_reduce"]
