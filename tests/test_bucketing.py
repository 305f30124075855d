"""Shape-bucketed input pipeline (VERDICT round 1, weak #4):

- transforms over arbitrary source shapes must be EXACT (equal to the
  direct unbucketed resample) and must compile a bounded number of XLA
  programs (one per bucket, not one per shape).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from missm_tpu.ops.bucketing import (SPATIAL_LADDER, WAVEFORM_LADDER,
                                     bucket_up, pad_to)
from missm_tpu.ops.image_transforms import (
    _image_kernel, _normalize, _video_kernel, image_transform,
    video_transform, depth_transform)
from missm_tpu.ops.melfbank import (FbankConfig, _audio_kernel,
                                    audio_model_input, chunk_ranges,
                                    kaldi_fbank, num_frames,
                                    waveform_to_model_input)
from missm_tpu.ops.resize import center_crop, resize2d, \
    short_side_resize_shape

pytestmark = pytest.mark.filterwarnings("ignore")


def test_bucket_up():
    assert bucket_up(1) == 32
    assert bucket_up(32) == 32
    assert bucket_up(33) == 48
    assert bucket_up(224) == 224
    assert bucket_up(225) == 288
    assert bucket_up(SPATIAL_LADDER[-1] + 1) == 2 * SPATIAL_LADDER[-1]
    assert bucket_up(100000, WAVEFORM_LADDER) == 128000


def test_pad_to():
    x = np.arange(6).reshape(2, 3)
    y = pad_to(x, (4, None))
    assert y.shape == (4, 3) and (y[2:] == 0).all()
    with pytest.raises(ValueError):
        pad_to(x, (1, 3))


def _direct_image(img, size=224):
    """The unbucketed round-1 pipeline: resize2d + center_crop."""
    x = jnp.asarray(img).astype(jnp.float32) / 255.0
    x = x.transpose(2, 0, 1)
    h, w = x.shape[-2:]
    x = resize2d(x, short_side_resize_shape(h, w, size), "bicubic",
                 antialias=True)
    x = center_crop(x, size)
    return np.asarray(_normalize(x))


@pytest.mark.parametrize("shape", [(40, 56), (57, 41), (224, 224),
                                   (231, 173), (500, 37)])
def test_bucketed_image_exact(rng, shape):
    img = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
    got = np.asarray(image_transform(img))
    ref = _direct_image(img)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_image_compile_count_bounded(rng):
    """17 distinct source shapes inside one bucket pair -> ONE program."""
    before = _image_kernel._cache_size()
    for h in range(225, 242):
        img = rng.integers(0, 256, size=(h, 300, 3), dtype=np.uint8)
        out = image_transform(img)
        assert out.shape == (3, 224, 224)
    assert _image_kernel._cache_size() - before <= 1


def test_video_compile_count_and_flip(rng):
    before = _video_kernel._cache_size()
    outs = []
    for (h, w) in [(120, 161), (125, 163), (118, 165)]:
        frames = rng.integers(0, 256, size=(2, h, w, 3), dtype=np.uint8)
        outs.append(np.asarray(video_transform(frames)))
    assert _video_kernel._cache_size() - before <= 1
    # flip folded into the weight matrix: no extra program, exact reversal
    frames = rng.integers(0, 256, size=(2, 120, 161, 3), dtype=np.uint8)
    a = np.asarray(video_transform(frames, flip=False))
    b = np.asarray(video_transform(frames, flip=True))
    np.testing.assert_allclose(a, b[..., ::-1], atol=1e-6)
    assert _video_kernel._cache_size() - before <= 1


def test_depth_image_max_branch(rng):
    """max_depth=0 -> divide by the per-image max (padding must not leak
    into the max)."""
    depth = rng.integers(500, 20000, size=(100, 90)).astype(np.float32)
    got = np.asarray(depth_transform(depth, max_depth=0.0))
    d = depth / 1000.0
    d = np.maximum(d, 0.01)
    d = d / d.max()
    x = np.broadcast_to(d[None], (3,) + d.shape)
    x = resize2d(jnp.asarray(x), short_side_resize_shape(100, 90, 224),
                 "bicubic", antialias=True)
    ref = np.asarray(_normalize(center_crop(x, 224)))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("n_sec,target", [(2.0, 1024), (12.0, 1024),
                                          (1.2, 112)])
def test_bucketed_audio_exact(rng, n_sec, target):
    """audio_model_input == unbucketed kaldi_fbank + chunk/tile for long,
    short, and exact lengths."""
    cfg = FbankConfig(num_mel_bins=64)
    n = int(16000 * n_sec)
    wav = rng.standard_normal(n).astype(np.float32)
    T = num_frames(n, cfg)
    if T > target:
        r0, r1, r2 = chunk_ranges(T, target)
        idx = (int(r0[0]), int(r1[0]), int(r2[0]))
    else:
        idx = (0, 0, 0)
    got = np.asarray(audio_model_input(wav, cfg, target, idx, -4.2, 4.5))
    mel = kaldi_fbank(jnp.asarray(wav), cfg)
    ref = np.asarray(waveform_to_model_input(mel, target, idx, -4.2, 4.5))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_audio_compile_count_bounded(rng):
    cfg = FbankConfig(num_mel_bins=32)
    before = _audio_kernel._cache_size()
    for n in (16500, 17000, 18000, 20000, 23900):  # all bucket to 24000
        wav = rng.standard_normal(n).astype(np.float32)
        out = audio_model_input(wav, cfg, 112, (0, 0, 0), 0.0, 1.0)
        assert out.shape == (3, 32, 112)
    assert _audio_kernel._cache_size() - before <= 1
