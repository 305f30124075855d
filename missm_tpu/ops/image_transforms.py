"""Device-resident image / video / depth / thermal preprocessing,
shape-bucketed.

Replaces the host-side torchvision/pytorchvideo transform stacks of the
reference processors with jittable functions over decoded frame tensors.
The short-side resize + center crop (+ optional hflip) compose into ONE
pair of dense resampling matrices built host-side ([size, H] x [size, W]),
so each transform compiles to two MXU matmuls fused with the elementwise
normalize — and because the source image and the weight COLUMNS are
zero-padded to a bucket shape (ops.bucketing), arbitrarily-shaped inputs
share a bounded set of XLA programs while producing bit-exact results
(padded columns carry zero weight).

Reference semantics (citations into /root/reference):
- image/thermal: ToTensor (/255) -> Resize(short side 224, bicubic,
  antialias) -> CenterCrop(224) -> Normalize(CLIP mean/std)
  (image/processing_image.py:18-28; thermal identical,
  thermal/processing_thermal.py:15-31).
- video: /255 -> NormalizeVideo -> ShortSideScale(224, bilinear, no
  antialias) -> CenterCrop(224) -> RandomHorizontalFlip(p=0.5)
  (video/processing_video.py:42-53). Resize weights sum to 1 per output
  row, so normalize commutes with the resample exactly; the flip is folded
  into the width weight matrix (reversed rows). The reference applies the
  random flip at eval too; the flip decision is an explicit argument so
  eval can be pinned deterministic (see SURVEY §7 'eval randomness
  parity').
- depth: /1000 m -> clip(min 0.01[, max]) -> /max (or /img.max()) -> 3-chan
  -> Resize(224, bicubic) -> CenterCrop -> Normalize
  (depth/processing_depth.py:21-56).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .bucketing import bucket_up, pad_to
from .resize import center_crop, resize_matrix, resize2d, \
    short_side_resize_shape

OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)


def _normalize(img_chw, mean=OPENAI_MEAN, std=OPENAI_STD):
    mean = jnp.asarray(mean, img_chw.dtype).reshape(-1, 1, 1)
    std = jnp.asarray(std, img_chw.dtype).reshape(-1, 1, 1)
    return (img_chw - mean) / std


@functools.lru_cache(maxsize=4096)
def crop_resize_weights(h: int, w: int, size: int, method: str,
                        antialias: bool, flip: bool = False):
    """Host-built combined short-side-resize + center-crop (+hflip)
    matrices, zero-padded to the (bucket_up(h), bucket_up(w)) columns:
    returns (mh [size, Hb], mw [size, Wb]) float32 numpy."""
    th, tw = short_side_resize_shape(h, w, size)
    mh = resize_matrix(h, th, method, antialias)
    mw = resize_matrix(w, tw, method, antialias)
    top = int(round((th - size) / 2.0))
    left = int(round((tw - size) / 2.0))
    mh = mh[top:top + size]
    mw = mw[left:left + size]
    if flip:
        mw = mw[::-1]
    return (pad_to(mh, (None, bucket_up(h))),
            pad_to(mw, (None, bucket_up(w))))


@jax.jit
def _image_kernel(img_pad, mh, mw):
    """[Hb, Wb, C] uint8, [S, Hb], [S, Wb] -> [C, S, S] normalized f32."""
    x = img_pad.astype(jnp.float32) / 255.0
    x = x.transpose(2, 0, 1)
    y = jnp.einsum("oh,chw->cow", mh, x,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,cow->cop", mw, y,
                   preferred_element_type=jnp.float32)
    return _normalize(y)


def image_transform(img_hwc_uint8, size: int = 224):
    """[H, W, C] uint8 -> [C, size, size] float32 (image & thermal path).
    One compile per (bucket_h, bucket_w); exact for any source shape."""
    img = np.asarray(img_hwc_uint8)
    h, w = img.shape[:2]
    mh, mw = crop_resize_weights(h, w, size, "bicubic", True)
    img_p = pad_to(img, (mh.shape[1], mw.shape[1], None))
    return _image_kernel(jnp.asarray(img_p), jnp.asarray(mh),
                         jnp.asarray(mw))


@jax.jit
def _video_kernel(frames_pad, mh, mw):
    """[T, Hb, Wb, C] uint8, [S, Hb], [S, Wb] -> [C, T, S, S] f32."""
    x = frames_pad.astype(jnp.float32) / 255.0
    x = x.transpose(3, 0, 1, 2)                 # C T H W
    x = _normalize(x.transpose(1, 0, 2, 3)).transpose(1, 0, 2, 3)
    y = jnp.einsum("oh,cthw->ctow", mh, x,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,ctow->ctop", mw, y,
                   preferred_element_type=jnp.float32)
    return y


def video_transform(frames_thwc_uint8, size: int = 224, flip: bool = False):
    """[T, H, W, C] uint8 -> [C, T, size, size] float32.

    decord-backend transform order (normalize before the bilinear
    short-side scale; exact commute since weight rows sum to 1)."""
    frames = np.asarray(frames_thwc_uint8)
    h, w = frames.shape[1:3]
    mh, mw = crop_resize_weights(h, w, size, "bilinear", False, flip=flip)
    frames_p = pad_to(frames, (None, mh.shape[1], mw.shape[1], None))
    return _video_kernel(jnp.asarray(frames_p), jnp.asarray(mh),
                         jnp.asarray(mw))


@jax.jit
def _depth_kernel(depth_pad, valid, mh, mw, max_depth):
    """[Hb, Wb] f32 raw mm, [Hb, Wb] bool, weights -> [3, S, S] f32.
    max_depth is a traced scalar; 0 selects the per-image max (the
    reference's DepthNorm max_depth=0 branch)."""
    d = depth_pad / 1000.0
    d = jnp.maximum(d, 0.01)
    img_max = jnp.max(jnp.where(valid, d, 0.0))
    denom = jnp.where(max_depth > 0, max_depth, img_max)
    d = jnp.where(max_depth > 0, jnp.minimum(d, max_depth), d) / denom
    x = jnp.broadcast_to(d[None], (3,) + d.shape)
    y = jnp.einsum("oh,chw->cow", mh, x,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,cow->cop", mw, y,
                   preferred_element_type=jnp.float32)
    return _normalize(y)


def depth_transform(depth_hw, size: int = 224, max_depth: float = 10.0,
                    min_depth: float = 0.01):
    """[H, W] float32 (raw sensor units, mm) -> [3, size, size] float32."""
    del min_depth  # fixed 0.01 (reference DepthNorm)
    raw = np.asarray(depth_hw, np.float32)
    h, w = raw.shape
    mh, mw = crop_resize_weights(h, w, size, "bicubic", True)
    hb, wb = mh.shape[1], mw.shape[1]
    valid = pad_to(np.ones((h, w), bool), (hb, wb))
    return _depth_kernel(jnp.asarray(pad_to(raw, (hb, wb))),
                         jnp.asarray(valid), jnp.asarray(mh),
                         jnp.asarray(mw), jnp.float32(max_depth))


# ---------------------------------------------------------------------------
# Host (C++) transform path
#
# Per-SAMPLE device transforms are wrong on a tunneled platform: each
# synchronous dispatch+readback measured ~290 ms (scripts, round 2) vs
# ~1 ms for the same math on the host. The band form strips each row of the
# same resize matrices to its compact kernel support and runs the separable
# resample in cpp/ingest.cc; the device (bucketed matmul) path remains for
# environments without the native library and for parity tests.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4096)
def crop_resize_bands(h: int, w: int, size: int, method: str,
                      antialias: bool, flip: bool = False):
    """Banded form of crop_resize_weights (UNpadded): returns
    (wh [size, tapsh], loh [size], ww [size, tapsw], low [size])."""
    th, tw = short_side_resize_shape(h, w, size)
    mh = resize_matrix(h, th, method, antialias)
    mw = resize_matrix(w, tw, method, antialias)
    top = int(round((th - size) / 2.0))
    left = int(round((tw - size) / 2.0))
    mh = mh[top:top + size]
    mw = mw[left:left + size]
    if flip:
        mw = mw[::-1]

    def to_band(m, src):
        nz = m != 0
        any_nz = nz.any(axis=1)
        lo = np.where(any_nz, np.argmax(nz, axis=1), 0).astype(np.int32)
        hi = np.where(any_nz, src - 1 - np.argmax(nz[:, ::-1], axis=1), 0)
        taps = max(int((hi - lo).max()) + 1, 1)
        lo = np.minimum(lo, max(src - taps, 0)).astype(np.int32)
        idx = lo[:, None] + np.arange(taps)[None]
        band = np.take_along_axis(m, idx, axis=1).astype(np.float32)
        return np.ascontiguousarray(band), lo

    bh, loh = to_band(mh, h)
    bw, low = to_band(mw, w)
    return bh, loh, bw, low


_MEAN_F32 = np.asarray(OPENAI_MEAN, np.float32)
_STD_F32 = np.asarray(OPENAI_STD, np.float32)
_ZERO3 = np.zeros(3, np.float32)
_ONE3 = np.ones(3, np.float32)


def image_transform_host(img_hwc_uint8, size: int = 224):
    """Host-side image/thermal transform: [H, W, 3] uint8 ->
    [3, size, size] f32; same math as `image_transform` (banded C++
    resample). Returns None when the native library is unavailable."""
    from ..ingest import native
    img = np.asarray(img_hwc_uint8)
    bh, loh, bw, low = crop_resize_bands(img.shape[0], img.shape[1], size,
                                         "bicubic", True)
    return native.resample_u8_norm(img, bh, loh, bw, low, _MEAN_F32,
                                   _STD_F32)


def video_transform_host(frames_thwc_uint8, size: int = 224,
                         flip: bool = False):
    """Host-side video transform: [T, H, W, 3] uint8 -> [3, T, size, size]
    f32 (bilinear, no antialias; normalize commutes exactly with the
    resample since weight rows sum to 1)."""
    from ..ingest import native
    frames = np.asarray(frames_thwc_uint8)
    t, h, w = frames.shape[:3]
    bh, loh, bw, low = crop_resize_bands(h, w, size, "bilinear", False,
                                         flip=flip)
    out = np.empty((3, t, size, size), np.float32)
    for i in range(t):
        r = native.resample_u8_norm(frames[i], bh, loh, bw, low, _MEAN_F32,
                                    _STD_F32)
        if r is None:
            return None
        out[:, i] = r
    return out


def image_transform_host_u8(img_hwc_uint8, size: int = 224):
    """--uint8_upload variant of `image_transform_host`: resize+crop in f32,
    round back to [3, size, size] uint8; (x/255 - mean)/std moves to the
    device (models.finetune._dequantize, fused into the tower input cast).
    Quantize-after-resize mirrors PIL's uint8 Resize in the reference
    pipeline (image/processing_image.py: Resize on PIL precedes ToTensor);
    max error 0.5/255 of dynamic range. Returns None without the native
    library."""
    from ..ingest import native
    img = np.asarray(img_hwc_uint8)
    bh, loh, bw, low = crop_resize_bands(img.shape[0], img.shape[1], size,
                                         "bicubic", True)
    return native.resample_u8_u8(img, bh, loh, bw, low)


def video_transform_host_u8(frames_thwc_uint8, size: int = 224,
                            flip: bool = False):
    """--uint8_upload variant of `video_transform_host`:
    [T, H, W, 3] uint8 -> [3, T, size, size] uint8 (bilinear resample in
    f32, rounded); normalize happens on device."""
    from ..ingest import native
    frames = np.asarray(frames_thwc_uint8)
    t, h, w = frames.shape[:3]
    bh, loh, bw, low = crop_resize_bands(h, w, size, "bilinear", False,
                                         flip=flip)
    out = np.empty((3, t, size, size), np.uint8)
    for i in range(t):
        r = native.resample_u8_u8(frames[i], bh, loh, bw, low)
        if r is None:
            return None
        out[:, i] = r
    return out


def depth_transform_host(depth_hw, size: int = 224, max_depth: float = 10.0):
    """Host-side depth transform (DepthNorm in numpy + banded resample)."""
    from ..ingest import native
    raw = np.asarray(depth_hw, np.float32)
    d = raw / 1000.0
    d = np.maximum(d, 0.01)
    denom = max_depth if max_depth > 0 else float(d.max())
    if max_depth > 0:
        d = np.minimum(d, max_depth)
    d = d / denom
    bh, loh, bw, low = crop_resize_bands(raw.shape[0], raw.shape[1], size,
                                         "bicubic", True)
    plane = native.resample_f32(d, bh, loh, bw, low)
    if plane is None:
        return None
    out = np.broadcast_to(plane[None], (3, size, size))
    return ((out - _MEAN_F32[:, None, None]) / _STD_F32[:, None, None]
            ).astype(np.float32)


def uniform_frame_indices(duration: int, num_frames: int):
    """linspace frame sampling over the full clip — decord/opencv backends
    (reference video/processing_video.py:92,100)."""
    return np.linspace(0, duration - 1, num_frames, dtype=int)


def uniform_temporal_subsample_indices(t: int, num_frames: int):
    """pytorchvideo `UniformTemporalSubsample` sampling — the
    pytorchvideo-backend path (reference video/processing_video.py:31,
    get_clip + subsample). Bit-faithful to
    `torch.linspace(0, t-1, n).clamp(0, t-1).long()`: torch's CPU linspace
    computes from BOTH ends in float32 (start + i*step for i < n//2,
    end - (n-1-i)*step otherwise), which truncates differently from
    np.linspace near integer boundaries."""
    if num_frames == 1:
        return np.zeros(1, np.int64)
    step = np.float32((t - 1) / (num_frames - 1))
    i = np.arange(num_frames)
    lo = (np.float32(0) + step * i.astype(np.float32)).astype(np.float32)
    hi = (np.float32(t - 1)
          - step * (num_frames - 1 - i).astype(np.float32)).astype(np.float32)
    vals = np.where(i < num_frames // 2, lo, hi)
    return np.clip(vals, 0, t - 1).astype(np.int64)
