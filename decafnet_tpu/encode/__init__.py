from .transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    center_crop,
    eval_transform,
    horizontal_flip,
    normalize,
    random_resized_crop,
    resize_bilinear,
    resize_short_side,
    train_transform,
)
from .encoder import (
    ClipEncoder,
    ClipEncoderRunner,
    encode_video,
    make_clip_encoder,
)

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "center_crop",
    "eval_transform",
    "horizontal_flip",
    "normalize",
    "random_resized_crop",
    "resize_bilinear",
    "resize_short_side",
    "train_transform",
    "ClipEncoder",
    "ClipEncoderRunner",
    "encode_video",
    "make_clip_encoder",
]
