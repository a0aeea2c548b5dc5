from .masked import (
    masked_avg_pool1d,
    masked_max_pool1d,
    max_pool1d,
    interpolate_nearest_1d,
    interpolate_linear_1d,
    sinusoid_encoding,
    channel_layer_norm,
)
from .local_attention import (
    band_attention,
    band_attention_xla,
    band_attention_pallas,
    band_attention_reference,
    set_backend,
    get_backend,
)
from .delegation import saliency_correlation, delegation_weights, delegate

__all__ = [
    "masked_avg_pool1d",
    "masked_max_pool1d",
    "max_pool1d",
    "interpolate_nearest_1d",
    "interpolate_linear_1d",
    "sinusoid_encoding",
    "channel_layer_norm",
    "band_attention",
    "band_attention_xla",
    "band_attention_pallas",
    "band_attention_reference",
    "set_backend",
    "get_backend",
    "saliency_correlation",
    "delegation_weights",
    "delegate",
]
