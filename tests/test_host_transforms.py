"""Host (C++ banded resample / numpy fbank) transforms == the device
(bucketed matmul / jitted fbank) transforms.

The host path exists because a per-sample synchronous device round-trip
measured ~290 ms on the tunneled TPU (round-2 duty-cycle probe): the
loader hot path must stay on the host. Both paths are built from the SAME
resize matrices, so they must agree to f32 summation-order tolerance."""
import numpy as np
import pytest

from missm_tpu.ingest import native
from missm_tpu.ops.image_transforms import (
    depth_transform, depth_transform_host, image_transform,
    image_transform_host, video_transform, video_transform_host,
)
from missm_tpu.ops.melfbank import (
    FbankConfig, audio_model_input, audio_model_input_host, chunk_ranges,
    kaldi_fbank, kaldi_fbank_host, num_frames,
)

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native ingest lib not built")

SHAPES = [(224, 224), (360, 480), (500, 375), (41, 67), (231, 309)]


@needs_native
@pytest.mark.parametrize("h,w", SHAPES)
def test_image_host_matches_device(h, w):
    rng = np.random.default_rng(h * 1000 + w)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    host = image_transform_host(img, 224)
    dev = np.asarray(image_transform(img, 224))
    assert host.shape == dev.shape == (3, 224, 224)
    np.testing.assert_allclose(host, dev, atol=2e-4, rtol=1e-4)


@needs_native
@pytest.mark.parametrize("flip", [False, True])
def test_video_host_matches_device(flip):
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(4, 180, 320, 3), dtype=np.uint8)
    host = video_transform_host(frames, 224, flip=flip)
    dev = np.asarray(video_transform(frames, 224, flip=flip))
    assert host.shape == dev.shape == (3, 4, 224, 224)
    np.testing.assert_allclose(host, dev, atol=2e-4, rtol=1e-4)


@needs_native
@pytest.mark.parametrize("max_depth", [10.0, 0.0])
def test_depth_host_matches_device(max_depth):
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 12000, size=(190, 250)).astype(np.float32)
    host = depth_transform_host(raw, 224, max_depth)
    dev = np.asarray(depth_transform(raw, 224, max_depth))
    np.testing.assert_allclose(host, dev, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("seconds", [12.0, 6.0, 10.364])
def test_audio_host_matches_device(seconds):
    """long (3-chunk), short (tile), exact (stack x3) paths."""
    cfg = FbankConfig()
    rng = np.random.default_rng(5)
    wav = rng.standard_normal(int(16000 * seconds)).astype(np.float32)
    wav = wav - wav.mean()
    target = 1036
    T = num_frames(len(wav), cfg)
    if T > target:
        r0, r1, r2 = chunk_ranges(T, target)
        idx = (int(r0[0]), int(r1[0]), int(r2[0]))
    else:
        idx = (0, 0, 0)
    host = audio_model_input_host(wav, cfg, target, idx, -4.2677393, 4.5689974)
    dev = np.asarray(audio_model_input(wav, cfg, target, idx, -4.2677393,
                                       4.5689974))
    assert host.shape == dev.shape == (3, 112, 1036)
    np.testing.assert_allclose(host, dev, atol=2e-3, rtol=1e-4)


def test_fbank_host_matches_device():
    rng = np.random.default_rng(6)
    wav = rng.standard_normal(16000).astype(np.float32)
    host = kaldi_fbank_host(wav)
    dev = np.asarray(kaldi_fbank(wav))
    np.testing.assert_allclose(host, dev, atol=2e-3, rtol=1e-4)
