"""Video frame transforms for the on-device encode step.

Replicates the semantics of the reference's EgoVLP transform dicts
(reference: libs/helper/egovlp_transforms.py:4-32) without torchvision:

  val/test: Resize(short side -> 256, bilinear) -> CenterCrop(256)
            -> Resize(224) -> Normalize(ImageNet mean/std)
  train:    RandomResizedCrop(224, scale=(0.5, 1.0)) -> RandomHorizontalFlip
            -> ColorJitter(0, 0, 0) [identity at the reference defaults]
            -> Normalize

Frames are channel-last float32 ``(..., H, W, 3)`` in [0, 1] (TPU prefers
channel-last convolutions; torchvision's ToTensorVideo scaling by 1/255 is
the caller's job). Bilinear resize matches torch
``F.interpolate(mode='bilinear', align_corners=False)`` -- the tensor path
torchvision used at the reference's pin (no antialias) -- and is
oracle-tested against torch in tests/test_encode.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _linspace_half_pixel(out_size, in_size):
    """Source sampling positions of torch bilinear align_corners=False."""
    scale = in_size / out_size
    pos = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    return np.clip(pos, 0, in_size - 1)


def resize_bilinear(x, out_h, out_w, antialias=False):
    """Bilinear resize of the (H, W) axes of ``(..., H, W, C)``.

    Implemented as two one-hot interpolation MATMULS (rows then columns):
    the interpolation weights are trace-time numpy constants, so the whole
    resize runs on the MXU with no gathers -- the TPU-native formulation of
    torch F.interpolate(bilinear, align_corners=False).

    ``antialias=True`` matches torch/torchvision ``antialias=True`` (the
    PIL-compatible path: triangle filter whose support scales with the
    downsampling factor, taps clipped to the image and re-normalized).
    Modern torchvision pins default tensor-input Resize to antialias=True,
    so real offline EgoVLP features may have been produced either way; both
    variants are provided and oracle-tested (tests/test_encode.py).
    """
    in_h, in_w = x.shape[-3], x.shape[-2]

    def weight_matrix(out_size, in_size):
        scale = in_size / out_size
        if antialias and scale > 1.0:
            # triangle (bilinear) kernel stretched by the scale factor,
            # normalized over in-bounds taps -- exactly PIL / torch
            # antialias downsampling
            pos = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
            j = np.arange(in_size, dtype=np.float64)
            m = np.clip(1.0 - np.abs(j[None, :] - pos[:, None]) / scale,
                        0.0, None)
            m /= m.sum(axis=1, keepdims=True)
            return m.astype(np.float32)
        pos = _linspace_half_pixel(out_size, in_size)
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, in_size - 1)
        w = (pos - lo).astype(np.float32)
        m = np.zeros((out_size, in_size), np.float32)
        m[np.arange(out_size), lo] += 1.0 - w
        m[np.arange(out_size), hi] += w
        return m

    mh = jnp.asarray(weight_matrix(out_h, in_h))  # (out_h, in_h)
    mw = jnp.asarray(weight_matrix(out_w, in_w))  # (out_w, in_w)
    x = jnp.einsum("oh,...hwc->...owc", mh, x)
    x = jnp.einsum("ow,...hwc->...hoc", mw, x)
    return x


def resize_short_side(x, size, antialias=False):
    """torchvision Resize(int): scale the SHORT side to ``size`` keeping
    aspect ratio (output dims floor like torchvision's int arithmetic)."""
    h, w = x.shape[-3], x.shape[-2]
    if h <= w:
        out_h, out_w = size, max(1, int(size * w / h))
    else:
        out_h, out_w = max(1, int(size * h / w)), size
    return resize_bilinear(x, out_h, out_w, antialias=antialias)


def center_crop(x, size):
    """Center crop of the (H, W) axes; pads first if smaller (torchvision
    semantics)."""
    h, w = x.shape[-3], x.shape[-2]
    if h < size or w < size:
        pad_h, pad_w = max(size - h, 0), max(size - w, 0)
        pad = [(0, 0)] * (x.ndim - 3) + [
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2), (0, 0)]
        x = jnp.pad(x, pad)
        h, w = x.shape[-3], x.shape[-2]
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return x[..., top:top + size, left:left + size, :]


def normalize(x, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def eval_transform(x, center=256, input_res=224,
                   mean=IMAGENET_MEAN, std=IMAGENET_STD, antialias=False):
    """The reference val/test pipeline (egovlp_transforms.py:20-30).

    ``antialias`` selects between the two torchvision Resize behaviors
    (tensor-path no-antialias at older pins vs antialias=True at modern
    pins); verify against the pin that produced the target features before
    importing real encoder weights."""
    x = resize_short_side(x, center, antialias=antialias)
    x = center_crop(x, center)
    x = resize_bilinear(x, input_res, input_res, antialias=antialias)
    return normalize(x, mean, std)


def random_resized_crop(x, rng, size, scale=(0.5, 1.0), ratio=(3 / 4, 4 / 3),
                        trials=10):
    """torchvision RandomResizedCrop semantics (area-scaled crop, log-ratio
    aspect, 10 trials then center fallback), with an explicit JAX PRNG key;
    crop offsets are drawn on host (numpy) since crops change shapes."""
    h, w = x.shape[-3], x.shape[-2]
    area = h * w
    keys = jax.random.split(rng, trials * 3)
    for t in range(trials):
        target = area * float(jax.random.uniform(
            keys[3 * t], minval=scale[0], maxval=scale[1]))
        log_r = float(jax.random.uniform(
            keys[3 * t + 1], minval=np.log(ratio[0]), maxval=np.log(ratio[1])))
        r = np.exp(log_r)
        cw = int(round(np.sqrt(target * r)))
        ch = int(round(np.sqrt(target / r)))
        if 0 < cw <= w and 0 < ch <= h:
            u = jax.random.uniform(keys[3 * t + 2], (2,))
            top = int(float(u[0]) * (h - ch + 1))
            left = int(float(u[1]) * (w - cw + 1))
            crop = x[..., top:top + ch, left:left + cw, :]
            return resize_bilinear(crop, size, size)
    # fallback: center crop of the clamped aspect
    in_r = w / h
    if in_r < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_r > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    top, left = (h - ch) // 2, (w - cw) // 2
    return resize_bilinear(x[..., top:top + ch, left:left + cw, :],
                           size, size)


def horizontal_flip(x):
    return x[..., :, ::-1, :]


def train_transform(x, rng, input_res=224, scale=(0.5, 1.0),
                    mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """The reference train pipeline (egovlp_transforms.py:13-19); the
    reference's default ColorJitter(0, 0, 0) is the identity and is
    omitted."""
    k_crop, k_flip = jax.random.split(rng)
    x = random_resized_crop(x, k_crop, input_res, scale=scale)
    if float(jax.random.uniform(k_flip)) < 0.5:
        x = horizontal_flip(x)
    return normalize(x, mean, std)
