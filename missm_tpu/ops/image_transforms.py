"""Device-resident image / video / depth / thermal preprocessing.

Replaces the host-side torchvision/pytorchvideo transform stacks of the
reference processors with jittable functions over decoded frame tensors;
resizes are the dense-matmul resamplers of `ops.resize`, so each transform
compiles to a couple of MXU matmuls fused with the elementwise normalize.

Reference semantics (citations into /root/reference):
- image/thermal: ToTensor (/255) -> Resize(short side 224, bicubic,
  antialias) -> CenterCrop(224) -> Normalize(CLIP mean/std)
  (image/processing_image.py:18-28; thermal identical,
  thermal/processing_thermal.py:15-31).
- video: /255 -> NormalizeVideo -> ShortSideScale(224, bilinear, no
  antialias) -> CenterCrop(224) -> RandomHorizontalFlip(p=0.5)
  (video/processing_video.py:42-53). The reference applies the random flip
  at eval too; here the flip decision is an explicit argument so eval can be
  pinned deterministic (see SURVEY §7 'eval randomness parity').
- depth: /1000 m -> clip(min 0.01[, max]) -> /max (or /img.max()) -> 3-chan
  -> Resize(224, bicubic) -> CenterCrop -> Normalize
  (depth/processing_depth.py:21-56).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .resize import center_crop, resize2d, short_side_resize_shape

OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)


def _normalize(img_chw, mean=OPENAI_MEAN, std=OPENAI_STD):
    mean = jnp.asarray(mean, img_chw.dtype).reshape(-1, 1, 1)
    std = jnp.asarray(std, img_chw.dtype).reshape(-1, 1, 1)
    return (img_chw - mean) / std


@functools.partial(jax.jit, static_argnames=("size",))
def image_transform(img_hwc_uint8, size: int = 224):
    """[H, W, C] uint8 -> [C, size, size] float32 (image & thermal path)."""
    x = img_hwc_uint8.astype(jnp.float32) / 255.0
    x = x.transpose(2, 0, 1)
    h, w = x.shape[-2:]
    x = resize2d(x, short_side_resize_shape(h, w, size), "bicubic",
                 antialias=True)
    x = center_crop(x, size)
    return _normalize(x)


@functools.partial(jax.jit, static_argnames=("size", "flip"))
def video_transform(frames_thwc_uint8, size: int = 224, flip: bool = False):
    """[T, H, W, C] uint8 -> [C, T, size, size] float32.

    Matches the decord-backend transform order: normalize before the
    bilinear short-side scale (weights sum to 1, so this commutes, but the
    order is kept for bit-faithfulness)."""
    x = frames_thwc_uint8.astype(jnp.float32) / 255.0
    x = x.transpose(3, 0, 1, 2)                 # C T H W
    x = _normalize(x.transpose(1, 0, 2, 3)).transpose(1, 0, 2, 3)
    h, w = x.shape[-2:]
    x = resize2d(x, short_side_resize_shape(h, w, size), "bilinear",
                 antialias=False)
    x = center_crop(x, size)
    if flip:
        x = x[..., ::-1]
    return x


@functools.partial(jax.jit, static_argnames=("size", "max_depth"))
def depth_transform(depth_hw, size: int = 224, max_depth: float = 10.0,
                    min_depth: float = 0.01):
    """[H, W] float32 (raw sensor units, mm) -> [3, size, size] float32."""
    d = depth_hw.astype(jnp.float32) / 1000.0
    d = jnp.maximum(d, min_depth)
    if max_depth != 0:
        d = jnp.minimum(d, max_depth) / max_depth
    else:
        d = d / jnp.max(d)
    x = jnp.broadcast_to(d[None], (3,) + d.shape)
    x = resize2d(x, short_side_resize_shape(*d.shape, size), "bicubic",
                 antialias=True)
    x = center_crop(x, size)
    return _normalize(x)


def uniform_frame_indices(duration: int, num_frames: int):
    """linspace frame sampling over the full clip — decord/opencv backends
    (reference video/processing_video.py:92,100)."""
    import numpy as np
    return np.linspace(0, duration - 1, num_frames, dtype=int)
