"""Native C++ ingest tests: JPEG/PNG image decode, 16-bit PNG depth decode,
WAV parsing, MJPEG-AVI video decode with linspace sampling, and agreement
with the Python fallbacks."""
import io
import os
import wave as wave_mod

import numpy as np
import pytest

from missm_tpu.data import ingest_io
from missm_tpu.ingest import native

HAVE_NATIVE = native.available()


def _write_jpeg(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path, "JPEG", quality=95)


def _write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path, "PNG")


def _write_wav(path, data_i16, sr=16000, channels=1):
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data_i16.tobytes())


@pytest.mark.skipif(not HAVE_NATIVE, reason="native ingest not built")
def test_native_jpeg_decode(tmp_path, rng):
    arr = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    _write_jpeg(p, arr)
    got = native.decode_image(p)
    assert got.shape == (48, 64, 3)
    ref = ingest_io.decode_image.__wrapped__(p) if hasattr(
        ingest_io.decode_image, "__wrapped__") else None
    from PIL import Image
    pil = np.asarray(Image.open(p).convert("RGB"))
    # JPEG decoders may differ by a few LSBs in IDCT rounding
    assert np.abs(got.astype(int) - pil.astype(int)).max() <= 2


@pytest.mark.skipif(not HAVE_NATIVE, reason="native ingest not built")
def test_native_png_decode(tmp_path, rng):
    arr = rng.integers(0, 256, size=(32, 40, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    _write_png(p, arr)
    got = native.decode_image(p)
    np.testing.assert_array_equal(got, arr)  # PNG is lossless


@pytest.mark.skipif(not HAVE_NATIVE, reason="native ingest not built")
def test_native_depth16_decode(tmp_path, rng):
    arr = rng.integers(0, 65535, size=(24, 30), dtype=np.uint16)
    p = str(tmp_path / "d.png")
    from PIL import Image
    Image.fromarray(arr, mode="I;16").save(p)
    got = native.decode_depth(p)
    np.testing.assert_array_equal(got, arr)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native ingest not built")
def test_native_wav(tmp_path, rng):
    data = (rng.standard_normal(16000) * 8000).astype(np.int16)
    p = str(tmp_path / "a.wav")
    _write_wav(p, data, sr=16000)
    wav, sr = native.read_audio(p)
    assert sr == 16000
    np.testing.assert_allclose(wav, data.astype(np.float32) / 32768.0,
                               atol=1e-7)
    # python fallback agrees
    wav2, sr2 = ingest_io.read_audio(p)
    np.testing.assert_allclose(wav, wav2, atol=1e-7)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native ingest not built")
def test_native_video_mjpeg(tmp_path):
    from PIL import Image
    from tests.avi_writer import write_mjpeg_avi

    # 10 frames of distinct solid gray levels
    levels = [int(255 * i / 9) for i in range(10)]
    frames = []
    for lv in levels:
        buf = io.BytesIO()
        Image.fromarray(np.full((32, 48, 3), lv, np.uint8)).save(
            buf, "JPEG", quality=95)
        frames.append(buf.getvalue())
    p = str(tmp_path / "v.avi")
    write_mjpeg_avi(p, frames, 48, 32)

    got = native.decode_video(p, 4)
    assert got.shape == (4, 32, 48, 3)
    # linspace(0, 9, 4, dtype=int) -> frames [0, 3, 6, 9]
    expect = [levels[0], levels[3], levels[6], levels[9]]
    for i, lv in enumerate(expect):
        assert abs(int(got[i].mean()) - lv) <= 3, (i, lv, got[i].mean())


def test_python_wav_fallback(tmp_path, rng):
    data = (rng.standard_normal(800) * 8000).astype(np.int16)
    p = str(tmp_path / "b.wav")
    _write_wav(p, data, sr=8000)
    wav, sr = ingest_io.read_audio(p)
    assert sr == 8000 and len(wav) == 800


def test_resample_preserves_tone():
    from missm_tpu.ops.resample import resample_sinc
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample_sinc(wav, sr_in, sr_out)
    assert abs(len(out) - sr_out) <= 1
    # mid-region should still be a 440 Hz tone with amplitude ~1
    mid = out[2000:14000]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak_hz = np.argmax(spec) * sr_out / len(mid)
    assert abs(peak_hz - 440) < 5
    assert 0.9 < mid.max() < 1.1


def test_native_load_first_call_thread_safe():
    """BatchLoader fans first-batch decode over --num_workers threads;
    every thread racing _load() must observe the SAME availability (one
    thread seeing False while another loads the library would silently
    mix native and Python decode paths within a batch)."""
    import threading

    from missm_tpu.ingest import native

    tried, lib = native._TRIED, native._LIB
    try:
        native._TRIED, native._LIB = False, None
        n = 8
        barrier = threading.Barrier(n)
        results = []

        def go():
            barrier.wait()
            results.append(native.available())

        threads = [threading.Thread(target=go) for _ in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == n and len(set(results)) == 1
    finally:
        native._TRIED, native._LIB = tried, lib
