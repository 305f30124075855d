"""ctypes binding to the C++ ingest library (cpp/ -> libmissm_ingest.so).

The native library owns the decode hot path the reference delegated to
decord/OpenCV/PIL/torchaudio (SURVEY §2.3): JPEG/PNG via libjpeg/libpng,
WAV/PCM parsing, and FFmpeg (libavformat/avcodec/swscale) video decode with
linspace frame sampling. All functions return None on failure so callers
fall back to the Python decoders.

C ABI (see cpp/ingest.cc):
  int mi_decode_image(path, uint8** data, int* h, int* w)        // RGB8
  int mi_decode_depth(path, uint16** data, int* h, int* w)       // raw u16
  int mi_read_audio(path, float** data, long* n, int* sr)        // ch0
  int mi_decode_video(path, int num_frames, uint8** data,
                      int* t, int* h, int* w)                    // RGB8
  void mi_free(void*)
"""
from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False
# first-call init must be race-free: BatchLoader fans decode over a
# thread pool (--num_workers), so several threads can hit _load()
# concurrently on the first batch — without the lock one thread could
# observe _TRIED=True while _LIB is still mid-setup and silently take
# the Python fallback for its samples (mixed-path batches).
_LOAD_LOCK = threading.Lock()


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "cpp", "libmissm_ingest.so"),
        os.path.join(here, "libmissm_ingest.so"),
        os.environ.get("MISSM_INGEST_LIB", ""),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def _load():
    global _LIB, _TRIED
    if _TRIED:  # lock-free fast path: _LIB is published BEFORE _TRIED
        return _LIB
    with _LOAD_LOCK:
        if _TRIED:
            return _LIB
        _LIB = _load_locked()
        _TRIED = True
        return _LIB


def _load_locked():
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.mi_decode_image.restype = ctypes.c_int
        lib.mi_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.mi_decode_depth.restype = ctypes.c_int
        lib.mi_decode_depth.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.mi_read_audio.restype = ctypes.c_int
        lib.mi_read_audio.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int)]
        lib.mi_decode_video.restype = ctypes.c_int
        lib.mi_decode_video.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.mi_decode_video_indices.restype = ctypes.c_int
        lib.mi_decode_video_indices.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.mi_video_frame_count.restype = ctypes.c_int
        lib.mi_video_frame_count.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double)]
        lib.mi_decode_media_audio.restype = ctypes.c_int
        lib.mi_decode_media_audio.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int)]
        lib.mi_free.restype = None
        lib.mi_free.argtypes = [ctypes.c_void_p]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.mi_resample_u8_norm.restype = ctypes.c_int
        lib.mi_resample_u8_norm.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, i32p, ctypes.c_int, ctypes.c_int,
            f32p, i32p, ctypes.c_int, ctypes.c_int,
            f32p, f32p, f32p]
        lib.mi_resample_u8_u8.restype = ctypes.c_int
        lib.mi_resample_u8_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, i32p, ctypes.c_int, ctypes.c_int,
            f32p, i32p, ctypes.c_int, ctypes.c_int,
            u8p]
        lib.mi_resample_f32.restype = ctypes.c_int
        lib.mi_resample_f32.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int,
            f32p, i32p, ctypes.c_int, ctypes.c_int,
            f32p, i32p, ctypes.c_int, ctypes.c_int, f32p]
        return lib
    except (OSError, AttributeError):
        # OSError: no .so / unloadable. AttributeError: a stale prebuilt
        # .so missing a newer symbol (the .so is gitignored — users who
        # pull without `make -C cpp` must fall back, not crash).
        return None


def available() -> bool:
    return _load() is not None


def decode_image(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_uint8)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.mi_decode_image(path.encode(), ctypes.byref(data),
                           ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(data, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.mi_free(data)
    return arr


def decode_depth(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_uint16)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.mi_decode_depth(path.encode(), ctypes.byref(data),
                           ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(data, shape=(h.value, w.value)).copy()
    finally:
        lib.mi_free(data)
    return arr


def read_audio(path: str) -> Optional[Tuple[np.ndarray, int]]:
    lib = _load()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    sr = ctypes.c_int()
    if lib.mi_read_audio(path.encode(), ctypes.byref(data), ctypes.byref(n),
                         ctypes.byref(sr)) != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(data, shape=(n.value,)).copy()
    finally:
        lib.mi_free(data)
    return arr, sr.value


def decode_media_audio(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Decode the audio stream of any container to mono float32 at the
    stream's native sample rate."""
    lib = _load()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    sr = ctypes.c_int()
    if lib.mi_decode_media_audio(path.encode(), ctypes.byref(data),
                                 ctypes.byref(n), ctypes.byref(sr)) != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(data, shape=(n.value,)).copy()
    finally:
        lib.mi_free(data)
    return arr, sr.value


def video_frame_count(path: str) -> Optional[Tuple[int, float]]:
    """-> (total decode-order frames, average fps)."""
    lib = _load()
    if lib is None:
        return None
    total = ctypes.c_int64()
    fps = ctypes.c_double()
    if lib.mi_video_frame_count(path.encode(), ctypes.byref(total),
                                ctypes.byref(fps)) != 0:
        return None
    return total.value, fps.value


def decode_video_indices(path: str, indices) -> Optional[np.ndarray]:
    """Decode the frames at the given sorted decode-order indices
    (duplicates allowed) -> [len(indices), H, W, 3] uint8."""
    lib = _load()
    if lib is None:
        return None
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    data = ctypes.POINTER(ctypes.c_uint8)()
    t = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.mi_decode_video_indices(
            path.encode(), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), ctypes.byref(data), ctypes.byref(t), ctypes.byref(h),
            ctypes.byref(w)) != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(
            data, shape=(t.value, h.value, w.value, 3)).copy()
    finally:
        lib.mi_free(data)
    return arr


def decode_video(path: str, num_frames: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_uint8)()
    t = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.mi_decode_video(path.encode(), num_frames, ctypes.byref(data),
                           ctypes.byref(t), ctypes.byref(h),
                           ctypes.byref(w)) != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(
            data, shape=(t.value, h.value, w.value, 3)).copy()
    finally:
        lib.mi_free(data)
    return arr


def resample_u8_norm(img_hwc: np.ndarray, wh: np.ndarray, loh: np.ndarray,
                     ww: np.ndarray, low: np.ndarray, mean: np.ndarray,
                     std: np.ndarray) -> Optional[np.ndarray]:
    """Banded separable resample+crop of a [H, W, C] uint8 image with the
    normalize fused: returns [C, th, tw] float32 == the device matmul
    resampler's output (modulo f32 summation order). Bands come from
    ops.image_transforms.crop_resize_bands."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img_hwc, np.uint8)
    h, w, c = img.shape
    th, tw = wh.shape[0], ww.shape[0]
    out = np.empty((c, th, tw), np.float32)
    rc = lib.mi_resample_u8_norm(
        img, h, w, c,
        np.ascontiguousarray(wh, np.float32),
        np.ascontiguousarray(loh, np.int32), th, wh.shape[1],
        np.ascontiguousarray(ww, np.float32),
        np.ascontiguousarray(low, np.int32), tw, ww.shape[1],
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32), out)
    return out if rc == 0 else None


def resample_u8_u8(img_hwc: np.ndarray, wh: np.ndarray, loh: np.ndarray,
                   ww: np.ndarray, low: np.ndarray) -> Optional[np.ndarray]:
    """Banded separable resample+crop keeping uint8 output (rounded,
    clamped): [H, W, C] uint8 -> [C, th, tw] uint8. Normalization moves to
    the device (models.finetune dequantizes (x/255 - mean)/std in the
    jitted step) — the --uint8_upload path, 4x fewer tunnel bytes than
    f32 and 2x fewer than bf16."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img_hwc, np.uint8)
    h, w, c = img.shape
    th, tw = wh.shape[0], ww.shape[0]
    out = np.empty((c, th, tw), np.uint8)
    rc = lib.mi_resample_u8_u8(
        img, h, w, c,
        np.ascontiguousarray(wh, np.float32),
        np.ascontiguousarray(loh, np.int32), th, wh.shape[1],
        np.ascontiguousarray(ww, np.float32),
        np.ascontiguousarray(low, np.int32), tw, ww.shape[1], out)
    return out if rc == 0 else None


def resample_f32(img_hw: np.ndarray, wh: np.ndarray, loh: np.ndarray,
                 ww: np.ndarray, low: np.ndarray) -> Optional[np.ndarray]:
    """Banded separable resample of one [H, W] float32 plane -> [th, tw]."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img_hw, np.float32)
    h, w = img.shape
    th, tw = wh.shape[0], ww.shape[0]
    out = np.empty((th, tw), np.float32)
    rc = lib.mi_resample_f32(
        img, h, w,
        np.ascontiguousarray(wh, np.float32),
        np.ascontiguousarray(loh, np.int32), th, wh.shape[1],
        np.ascontiguousarray(ww, np.float32),
        np.ascontiguousarray(low, np.int32), tw, ww.shape[1], out)
    return out if rc == 0 else None
