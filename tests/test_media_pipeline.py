"""Production media pipeline end-to-end: real files -> native/python decode
-> device transforms -> tiny towers. Closes the loop the CLI smoke test
covers for images, for audio and video too."""
import io
import wave as wave_mod

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.core.config import tiny_tower
from missm_tpu.data.preprocess import make_audio_loader, make_video_loader
from missm_tpu.ingest import native
from missm_tpu.models.tower import init_tower_params, vision_features


def test_audio_path_end_to_end(tmp_path):
    """1 s 16 kHz tone -> kaldi fbank (98 frames) -> 3-chunk crop to
    target 48 -> [3, 32, 48] -> tiny audio tower."""
    cfg = tiny_tower("audio")
    sr = 16000
    t = np.arange(sr) / sr
    tone = (np.sin(2 * np.pi * 440 * t) * 0.5 * 32767).astype("<i2")
    p = str(tmp_path / "a.wav")
    with wave_mod.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(tone.tobytes())

    loader = make_audio_loader(cfg)
    arr = loader(p)
    assert arr.shape == (3, 32, 48)
    assert np.isfinite(arr).all()
    # deterministic eval: same file -> same output
    np.testing.assert_array_equal(arr, loader(p))

    params = init_tower_params(jax.random.PRNGKey(0), cfg)
    out = vision_features(params["vision"], cfg.vision,
                          jnp.asarray(arr)[None],
                          projection=params["visual_projection"])
    assert out.shape == (1, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_audio_resample_path(tmp_path):
    """A 22.05 kHz wav resamples to 16 kHz before the fbank."""
    cfg = tiny_tower("audio")
    sr = 22050
    tone = (np.sin(2 * np.pi * 300 * np.arange(sr // 2) / sr)
            * 0.4 * 32767).astype("<i2")
    p = str(tmp_path / "b.wav")
    with wave_mod.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(tone.tobytes())
    arr = make_audio_loader(cfg)(p)
    assert arr.shape == (3, 32, 48)
    assert np.isfinite(arr).all()


@pytest.mark.skipif(not native.available(), reason="native ingest not built")
def test_video_path_end_to_end(tmp_path):
    """MJPEG AVI -> FFmpeg decode (linspace frames) -> video transform ->
    tiny video tower."""
    from PIL import Image
    from tests.avi_writer import write_mjpeg_avi

    cfg = tiny_tower("video")  # 4 frames, 32x32 input
    frames = []
    rng = np.random.default_rng(0)
    for i in range(12):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
                        ).save(buf, "JPEG", quality=90)
        frames.append(buf.getvalue())
    p = str(tmp_path / "v.avi")
    write_mjpeg_avi(p, frames, 64, 48)

    loader = make_video_loader(num_frames=cfg.vision.num_frames, size=32)
    arr = loader(p)
    assert arr.shape == (3, 4, 32, 32)
    assert np.isfinite(arr).all()

    params = init_tower_params(jax.random.PRNGKey(0), cfg)
    out = vision_features(params["vision"], cfg.vision,
                          jnp.asarray(arr)[None],
                          projection=params["visual_projection"])
    assert out.shape == (1, 24)
    assert np.isfinite(np.asarray(out)).all()
