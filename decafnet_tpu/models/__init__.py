from .points import generate_points, select_points, fpn_lengths
from .text_net import TextTransformer, TextIdentity, make_text_net
from .video_net import VideoTransformer, make_video_net
from .fusion import XAttNFusion, make_fusion
from .heads import ClsHead, RegHead, make_head
from .tcn import TCN, DilatedResidualLayer
from .decafnet import (
    DeCafNetIterative,
    DeCafNetEarlyFusion,
    DeCafNetLateFusion,
    make_model,
    resolve_compute_dtype,
    resolve_matmul_precision,
)

__all__ = [
    "generate_points",
    "select_points",
    "fpn_lengths",
    "TextTransformer",
    "TextIdentity",
    "make_text_net",
    "VideoTransformer",
    "make_video_net",
    "XAttNFusion",
    "make_fusion",
    "ClsHead",
    "RegHead",
    "make_head",
    "TCN",
    "DilatedResidualLayer",
    "DeCafNetIterative",
    "DeCafNetEarlyFusion",
    "DeCafNetLateFusion",
    "make_model",
    "resolve_compute_dtype",
    "resolve_matmul_precision",
]
