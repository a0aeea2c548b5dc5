from .losses import (
    sigmoid_focal_loss,
    calc_focal_loss,
    ctr_giou_loss,
    ctr_diou_loss,
    calc_iou_loss,
    segment_iou,
)
from .annotate import annotate_points
from .optim import (
    decay_mask,
    make_optimizer,
    make_schedule,
    warmup_cosine_schedule,
    warmup_multistep_schedule,
    ema_update,
)
from .trainer import (Trainer, TrainState, build_train_step,
                      build_microbatch_loss)

__all__ = [
    "sigmoid_focal_loss",
    "calc_focal_loss",
    "ctr_giou_loss",
    "ctr_diou_loss",
    "calc_iou_loss",
    "segment_iou",
    "annotate_points",
    "decay_mask",
    "make_optimizer",
    "make_schedule",
    "warmup_cosine_schedule",
    "warmup_multistep_schedule",
    "ema_update",
    "Trainer",
    "TrainState",
    "build_train_step",
    "build_microbatch_loss",
]
