"""Production media loaders: decode (C++ ingest when built, Python
fallbacks otherwise) + device-resident transforms.

Each loader is `fn(path) -> np.ndarray` of the model's input shape for one
sample — the pluggable `media_loaders` contract of `data.loaders`. Decoding
runs host-side; the resize/normalize/mel math is the jitted device kernels
of `ops.image_transforms` / `ops.melfbank`, shape-BUCKETED (ops.bucketing)
so arbitrary source resolutions / wav lengths share a bounded set of XLA
programs (no per-shape recompiles in the hot path).

The reference's equivalents are languagebind/*/processing_*.py; dropout-free
determinism controls:
- `eval_flip`: the reference applies RandomHorizontalFlipVideo(p=0.5) at
  eval too (video/processing_video.py:37,51,63); default here pins eval
  deterministic (no flip) — set reference_randomness=True for parity runs.
- audio chunk choice (processing_audio.py:70-72) uses the provided rng.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from ..core.config import TowerConfig
from ..ops.image_transforms import (
    depth_transform, depth_transform_host, image_transform,
    image_transform_host, image_transform_host_u8, video_transform,
    video_transform_host, video_transform_host_u8,
)
from ..ops.melfbank import (
    FbankConfig, audio_model_input, chunk_ranges, num_frames,
)
from . import ingest_io


def _host_transforms() -> bool:
    """True when the C++ banded resampler is available. The device
    (bucketed matmul) transforms stay as the fallback, but a per-SAMPLE
    synchronous device round-trip costs ~290 ms on the tunneled platform
    (vs ~1 ms host), so the loader hot path prefers the host."""
    import os
    if os.environ.get("MISSM_DEVICE_TRANSFORMS"):
        return False
    from ..ingest import native
    return native.available()


def make_image_loader(size: int = 224, quantized: bool = False) -> Callable:
    """quantized (--uint8_upload): keep the resized/cropped frames uint8 so
    the host->device transfer ships 1 byte/px; the jitted step dequantizes
    (models.finetune). Requires the native resampler; falls back to the
    normalized f32 path otherwise (the model accepts either dtype)."""
    def load(path):
        img = ingest_io.decode_image(path)           # [H, W, 3] uint8
        if _host_transforms():
            out = (image_transform_host_u8(img, size) if quantized
                   else image_transform_host(img, size))
            if out is not None:
                return out
        return np.asarray(image_transform(img, size))
    return load


def make_thermal_loader(size: int = 224, quantized: bool = False) -> Callable:
    # thermal processing == image processing (thermal/processing_thermal.py)
    return make_image_loader(size, quantized=quantized)


def make_depth_loader(size: int = 224, max_depth: float = 10.0) -> Callable:
    def load(path):
        raw = ingest_io.decode_depth(path)           # [H, W] uint16/float
        if _host_transforms():
            out = depth_transform_host(raw.astype(np.float32), size,
                                       max_depth)
            if out is not None:
                return out
        return np.asarray(depth_transform(raw.astype(np.float32), size,
                                          max_depth))
    return load


def make_video_loader(num_frames: int = 8, size: int = 224,
                      reference_randomness: bool = False,
                      rng: Optional[np.random.Generator] = None,
                      backend: str = "decord",
                      clip_start_sec: float = 0.0,
                      clip_end_sec: Optional[float] = None,
                      quantized: bool = False) -> Callable:
    """Backend selects the reference's SAMPLING semantics (decode is always
    our FFmpeg ingest):
    - 'decord' / 'opencv' / 'ffmpeg': np.linspace(0, total-1, T) frame ids
      (processing_video.py:92,100) — one sequential decode pass.
    - 'pytorchvideo': EncodedVideo.get_clip(start, end) then
      UniformTemporalSubsample (processing_video.py:27-40,84-90): the frame
      window [start*fps, end*fps] subsampled with torch-linspace rounding
      (ops.image_transforms.uniform_temporal_subsample_indices).
    """
    rng = rng or np.random.default_rng(0)
    if backend not in ("decord", "opencv", "ffmpeg", "pytorchvideo"):
        raise NameError(  # reference error type, processing_video.py:67
            "video_decode_backend should specify in "
            "(pytorchvideo, decord, opencv)")

    def load(path):
        if backend == "pytorchvideo":
            from ..ops.image_transforms import \
                uniform_temporal_subsample_indices
            total, fps = ingest_io.video_frame_count(path)
            lo, hi = 0, total - 1
            if clip_end_sec is not None and fps > 0:
                lo = min(max(int(np.ceil(clip_start_sec * fps)), 0), hi)
                hi = min(int(np.floor(clip_end_sec * fps)), hi)
            idx = lo + uniform_temporal_subsample_indices(hi - lo + 1,
                                                          num_frames)
            frames = ingest_io.decode_video_indices(path, idx)
        else:
            frames = ingest_io.decode_video(path, num_frames)  # [T,H,W,3]
        flip = bool(rng.integers(0, 2)) if reference_randomness else False
        if _host_transforms():
            out = (video_transform_host_u8(frames, size, flip=flip)
                   if quantized
                   else video_transform_host(frames, size, flip=flip))
            if out is not None:
                return out
        return np.asarray(video_transform(frames, size, flip=flip))
    return load


def make_audio_loader(cfg: TowerConfig,
                      reference_randomness: bool = False,
                      rng: Optional[np.random.Generator] = None) -> Callable:
    """wav -> resample 16 kHz -> kaldi fbank -> chunk/tile -> [3, bins, T]
    (reference audio/processing_audio.py:31-111)."""
    rng = rng or np.random.default_rng(0)
    fb = FbankConfig(sample_rate=cfg.audio_sample_rate,
                     num_mel_bins=cfg.num_mel_bins)
    target = cfg.target_length

    def load(path):
        wav, sr = ingest_io.read_audio(path)
        if sr != cfg.audio_sample_rate:
            from ..ops.resample import resample_sinc
            wav = resample_sinc(wav, sr, cfg.audio_sample_rate)
        wav = wav - wav.mean()
        # frame count is known host-side from the length alone, so the
        # chunk choice never forces a device readback
        T = num_frames(len(wav), fb)
        if T > target:
            r0, r1, r2 = chunk_ranges(T, target)
            if reference_randomness:
                idx = (int(rng.choice(r0)), int(rng.choice(r1)),
                       int(rng.choice(r2)))
            else:
                idx = (int(r0[0]), int(r1[0]), int(r2[0]))
        else:
            idx = (0, 0, 0)
        import os
        if not os.environ.get("MISSM_DEVICE_TRANSFORMS"):
            # pure-numpy host path — needs no native lib
            from ..ops.melfbank import audio_model_input_host
            return audio_model_input_host(wav, fb, target, idx,
                                          cfg.audio_mean, cfg.audio_std)
        out = audio_model_input(wav, fb, target, idx, cfg.audio_mean,
                                cfg.audio_std)
        return np.asarray(out)
    return load


def make_media_loaders(tower_cfgs: Dict[str, TowerConfig],
                       reference_randomness: bool = False,
                       seed: int = 0,
                       quantized: bool = False) -> Dict[str, Callable]:
    rng = np.random.default_rng(seed)
    out: Dict[str, Callable] = {}
    for m, cfg in tower_cfgs.items():
        size = cfg.vision.image_size[0]  # square for all but audio
        if m == "image":
            out[m] = make_image_loader(size, quantized=quantized)
        elif m == "thermal":
            out[m] = make_thermal_loader(size, quantized=quantized)
        elif m == "depth":
            out[m] = make_depth_loader(size, max_depth=cfg.max_depth)
        elif m == "video":
            out[m] = make_video_loader(cfg.vision.num_frames, size,
                                       reference_randomness=
                                       reference_randomness, rng=rng,
                                       backend=cfg.video_decode_backend,
                                       quantized=quantized)
        elif m == "audio":
            out[m] = make_audio_loader(cfg, reference_randomness=
                                       reference_randomness, rng=rng)
        if m in ("video", "audio") and reference_randomness:
            # these draw from a SHARED sequential np.random.Generator —
            # parity runs depend on the draw order, so BatchLoader must
            # not fan their decode out across worker threads
            out[m].ordered_rng = True  # type: ignore[attr-defined]
    return out
