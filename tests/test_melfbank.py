"""Mel-fbank parity vs the independent numpy golden, plus the
chunk/repeat/normalize model-input transform semantics
(reference audio/processing_audio.py:54-111)."""
import numpy as np
import jax.numpy as jnp

from missm_tpu.ops.melfbank import (
    FbankConfig, chunk_ranges, kaldi_fbank, num_frames,
    waveform_to_model_input,
)
from tests.golden_kaldi import golden_fbank


def test_fbank_matches_golden(rng):
    wav = rng.standard_normal(16000).astype(np.float32)  # 1 s @ 16 kHz
    cfg = FbankConfig(num_mel_bins=24)
    got = np.asarray(kaldi_fbank(jnp.asarray(wav), cfg))
    ref = golden_fbank(wav, num_mel_bins=24)
    assert got.shape == ref.shape == (98, 24)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_fbank_sine_peak():
    """A pure 1 kHz tone must peak in the mel bin containing 1 kHz."""
    t = np.arange(16000) / 16000
    wav = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    cfg = FbankConfig(num_mel_bins=40)
    out = np.asarray(kaldi_fbank(jnp.asarray(wav), cfg))
    peak_bin = out.mean(0).argmax()
    # compute which bin 1 kHz falls into
    mel = lambda f: 1127 * np.log(1 + f / 700)
    d = (mel(8000) - mel(20)) / 41
    expect = int((mel(1000) - mel(20)) / d) - 1
    assert abs(int(peak_bin) - expect) <= 1


def test_num_frames():
    cfg = FbankConfig()
    assert num_frames(16000, cfg) == 98
    assert num_frames(400, cfg) == 1
    assert num_frames(399, cfg) == 0


def test_model_input_long_audio_chunks(rng):
    mel = jnp.asarray(rng.standard_normal((50, 8)).astype(np.float32))
    out = waveform_to_model_input(mel, 16, (0, 17, 34), 0.5, 0.5)
    assert out.shape == (3, 8, 16)
    np.testing.assert_allclose(
        np.asarray(out[0]),
        (np.asarray(mel)[0:16].T - 0.5) / 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[2]),
        (np.asarray(mel)[34:50].T - 0.5) / 1.0, atol=1e-6)


def test_model_input_short_audio_repeats(rng):
    mel = jnp.asarray(rng.standard_normal((6, 8)).astype(np.float32))
    out = waveform_to_model_input(mel, 16, (0, 0, 0), 0.0, 0.5)
    assert out.shape == (3, 8, 16)
    ref = np.tile(np.asarray(mel), (3, 1))[:16].T
    np.testing.assert_allclose(np.asarray(out[1]), ref / 1.0, atol=1e-6)
    # all three channels identical in the repeat path
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[2]))


def test_chunk_ranges_match_array_split():
    r0, r1, r2 = chunk_ranges(50, 16)
    ref = np.array_split(list(range(0, 35)), 3)
    assert list(r0) == list(ref[0])
    assert list(r1) == list(ref[1])
    assert list(r2) == list(ref[2])
    # too-short ranges fall back to [0] (reference :65-68)
    r0, r1, r2 = chunk_ranges(17, 16)
    assert list(r1) == [1] and list(r2) == [0]
    r0, r1, r2 = chunk_ranges(16, 16)
    assert list(r0) == [0] and list(r1) == [0] and list(r2) == [0]
