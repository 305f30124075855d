"""Separable image resampling expressed as dense matmuls.

Instead of translating torch's gather-based `F.interpolate`, each 1-D
resample is precomputed (host-side, numpy) as a dense (out, in) weight
matrix; a 2-D resize is then two matmuls — the shape the MXU wants, fuseable
with surrounding normalize/patchify ops.

Semantics match `torch.nn.functional.interpolate(..., align_corners=False)`:
- 'bicubic' antialias matches torch's PIL-compatible AA kernel (a=-0.5);
  non-antialias bicubic uses torch's a=-0.75.
- antialias=True stretches the kernel by the scale factor when downsampling
  and renormalizes over in-range taps (the torch/PIL antialias algorithm).
- antialias=False clamps source indices at the border (torch's behavior).

Used for: positional-embedding grid resize (reference
image/modeling_image.py:795-841, bicubic antialias), image/depth/thermal
Resize(224) (image/processing_image.py:23), video ShortSideScale (bilinear,
no antialias — pytorchvideo semantics, video/processing_video.py:35).
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(x, a):
    ax = np.abs(x)
    w = np.where(
        ax <= 1, ((a + 2) * ax - (a + 3)) * ax * ax + 1,
        np.where(ax < 2, (((ax - 5) * ax + 8) * ax - 4) * a, 0.0))
    return w


def _linear_kernel(x):
    return np.maximum(0.0, 1.0 - np.abs(x))


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int, method: str = "bicubic",
                  antialias: bool = True, a: float | None = None) -> np.ndarray:
    """Dense (out_size, in_size) resampling matrix, float32.

    `a` (the Keys cubic constant) defaults to torch's convention: the
    antialias path is PIL-compatible (a=-0.5); the non-antialias path uses
    a=-0.75."""
    if a is None:
        a = -0.5 if antialias else -0.75
    if method == "bicubic":
        kernel, support = (lambda x: _cubic_kernel(x, a)), 2.0
    elif method == "bilinear":
        kernel, support = _linear_kernel, 1.0
    else:
        raise ValueError(method)

    scale = in_size / out_size
    # antialias only matters when downsampling
    kscale = scale if (antialias and scale > 1.0) else 1.0

    out = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        if antialias:
            # torch upsample-AA span: taps j in [center-S+0.5, center+S+0.5)
            # with center = scale*(i+0.5); weights normalized over the
            # in-range taps (aten _compute_weights_span). Also used for
            # upsampling (kscale == 1), as torch does with antialias=True.
            center = (i + 0.5) * scale
            lo = max(int(center - support * kscale + 0.5), 0)
            hi = min(int(center + support * kscale + 0.5), in_size)
            idx = np.arange(lo, hi)
            w = kernel((idx + 0.5 - center) / kscale)
            w = w / w.sum()
            np.add.at(out[i], idx, w)
        else:
            center = (i + 0.5) * scale - 0.5
            # torch non-antialias: fixed tap count, border-clamped indices
            base = int(np.floor(center))
            taps = np.arange(base - int(support) + 1, base + int(support) + 1)
            w = kernel(taps - center)
            s = w.sum()
            if s != 0:
                w = w / s
            taps = np.clip(taps, 0, in_size - 1)
            np.add.at(out[i], taps, w)
    return out


def resize2d(img, out_hw, method: str = "bicubic", antialias: bool = True,
             a: float | None = None):
    """img: [..., H, W] -> [..., out_h, out_w]."""
    H, W = img.shape[-2], img.shape[-1]
    oh, ow = out_hw
    mh = jnp.asarray(resize_matrix(H, oh, method, antialias, a))
    mw = jnp.asarray(resize_matrix(W, ow, method, antialias, a))
    y = jnp.einsum("oh,...hw->...ow", mh, img,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,...ow->...op", mw, y,
                   preferred_element_type=jnp.float32)
    return y.astype(img.dtype)


def short_side_resize_shape(h: int, w: int, size: int):
    """Target (H', W') scaling the short side to `size`, aspect preserved.

    The long side TRUNCATES: torchvision Resize(int) computes
    `int(size * long / short)` and pytorchvideo ShortSideScale floors —
    e.g. 240x320 -> (224, 298), not round()'s 299 (which would also
    shift the center-crop offset by one)."""
    if h <= w:
        return size, max(1, int(w * size / h))
    return max(1, int(h * size / w)), size


def center_crop(img, size: int):
    """[..., H, W] -> [..., size, size], torch CenterCrop rounding."""
    H, W = img.shape[-2], img.shape[-1]
    top = int(round((H - size) / 2.0))
    left = int(round((W - size) / 2.0))
    return img[..., top:top + size, left:left + size]
