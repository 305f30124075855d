"""Kaldi-semantics log-mel filterbank, device-resident.

Replaces the reference's host-side `torchaudio.compliance.kaldi.fbank` call
(audio/processing_audio.py:97-111, args: htk_compat=True, hanning window,
dither=0, 25 ms frames, 10 ms shift, use_energy=False) with a jittable JAX
pipeline: framing (gather) -> DC removal -> preemphasis -> Hann window ->
zero-pad to pow2 -> rFFT power spectrum -> mel filterbank matmul -> log.
The mel filterbank is a precomputed static matrix, so the hot path is one
rFFT plus one MXU matmul.

Kaldi/torchaudio semantic details reproduced:
- snip_edges=True framing: n_frames = 1 + (n - window) // shift
- remove_dc_offset=True: per-frame mean subtraction
- preemphasis 0.97 with the first sample preemphasized against itself
- 'hanning' window = 0.5 - 0.5 cos(2 pi n / (N-1)) (periodic=False)
- padded_window_size = next power of two (512 @ 16 kHz / 25 ms)
- power spectrum |rfft|^2
- mel banks: HTK mel scale 1127 ln(1+f/700), low=20 Hz, high=nyquist,
  triangular weights over fft bins 0..N/2-1 (nyquist bin weight 0)
- log with float32-epsilon floor
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    num_mel_bins: int = 112
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0: offset from nyquist

    @property
    def window_size(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000)

    @property
    def window_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000)

    @property
    def padded_window_size(self) -> int:
        return 1 << (self.window_size - 1).bit_length()


def _mel(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@functools.lru_cache(maxsize=16)
def mel_banks(cfg: FbankConfig) -> np.ndarray:
    """(num_mel_bins, padded//2 + 1) triangular filterbank, float32.
    The nyquist column is zero (Kaldi computes bins over 0..N/2-1 and
    torchaudio pads one zero column)."""
    n_fft_bins = cfg.padded_window_size // 2
    nyquist = 0.5 * cfg.sample_rate
    high = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    mel_lo, mel_hi = _mel(cfg.low_freq), _mel(high)
    delta = (mel_hi - mel_lo) / (cfg.num_mel_bins + 1)

    fft_freqs = (cfg.sample_rate / cfg.padded_window_size) * np.arange(
        n_fft_bins)
    mel_f = _mel(fft_freqs)[None, :]                       # (1, F)
    left = mel_lo + np.arange(cfg.num_mel_bins)[:, None] * delta
    center = left + delta
    right = center + delta
    up = (mel_f - left) / (center - left)
    down = (right - mel_f) / (right - center)
    w = np.maximum(0.0, np.minimum(up, down)).astype(np.float32)
    return np.pad(w, ((0, 0), (0, 1)))                     # zero nyquist col


@functools.lru_cache(maxsize=16)
def _hann(window_size: int) -> np.ndarray:
    n = np.arange(window_size)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / (window_size - 1))).astype(
        np.float32)


def num_frames(n_samples: int, cfg: FbankConfig) -> int:
    return max(0, 1 + (n_samples - cfg.window_size) // cfg.window_shift)


@functools.partial(jax.jit, static_argnames=("cfg",))
def kaldi_fbank(waveform: jax.Array, cfg: FbankConfig = FbankConfig()):
    """waveform: [n_samples] float32 -> log-mel [n_frames, num_mel_bins].

    n_frames is static given the input length (snip_edges framing).
    """
    m = num_frames(waveform.shape[0], cfg)
    ws, shift = cfg.window_size, cfg.window_shift

    starts = jnp.arange(m) * shift
    idx = starts[:, None] + jnp.arange(ws)[None, :]
    frames = waveform[idx]                                  # [m, ws]

    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)

    if cfg.preemphasis:
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - cfg.preemphasis * prev

    frames = frames * jnp.asarray(_hann(ws))
    pad = cfg.padded_window_size - ws
    frames = jnp.pad(frames, ((0, 0), (0, pad)))

    spectrum = jnp.abs(jnp.fft.rfft(frames, axis=1)) ** 2   # [m, N/2+1]
    banks = jnp.asarray(mel_banks(cfg))
    energies = jnp.einsum("mf,bf->mb", spectrum, banks,
                          preferred_element_type=jnp.float32)
    eps = jnp.finfo(jnp.float32).eps
    return jnp.log(jnp.maximum(energies, eps))


def waveform_to_model_input(mel, target_length: int, chunk_indices,
                            audio_mean: float, audio_std: float):
    """Kaldi mel [T, bins] -> model input [3, bins, target_length].

    Mirrors `AudioTransform.waveform2melspec` (reference
    audio/processing_audio.py:54-95): three chunks (front/middle/back) when
    long, tile-repeat when short, x3 stack when exact; then transpose and
    normalize (x - mean) / (2 std).

    chunk_indices: host-chosen (front, middle, back) frame offsets — the
    data-dependent random choice stays on the host; this function is
    shape-static given (T, target_length).
    """
    T = mel.shape[0]
    if T > target_length:
        f, mdl, b = chunk_indices
        chunks = [jax.lax.dynamic_slice_in_dim(mel, i, target_length, 0)
                  for i in (f, mdl, b)]
        fusion = jnp.stack(chunks, axis=0)
    elif T < target_length:
        n_repeat = int(target_length / T) + 1
        rep = jnp.tile(mel, (n_repeat, 1))[:target_length]
        fusion = jnp.stack([rep, rep, rep], axis=0)
    else:
        fusion = jnp.stack([mel, mel, mel], axis=0)
    fusion = fusion.transpose(0, 2, 1)       # [3, bins, target]
    return (fusion - audio_mean) / (audio_std * 2.0)


@functools.partial(jax.jit, static_argnames=("cfg", "target_length"))
def _audio_kernel(wav_pad, n_true, offsets, cfg: FbankConfig,
                  target_length: int, audio_mean, audio_std):
    """Fused bucketed fbank -> chunk/tile -> normalize.

    wav_pad: [Nb] float32, zero-padded to a bucket length; n_true: the real
    sample count (traced); offsets: [3] int32 chunk starts (host-chosen,
    used only when n_frames(n_true) > target_length).

    Exactness under padding: frame i only touches samples
    [i*shift, i*shift + window), so frames below m_true = n_frames(n_true)
    are identical to the unpadded computation, and the output gather below
    never selects a row >= m_true (long path: chunk_ranges guarantees
    offset + target <= m_true; short path: indices are mod m_true).
    """
    mel = kaldi_fbank(wav_pad, cfg)                    # [m_bucket, bins]
    m_true = 1 + (n_true - cfg.window_size) // cfg.window_shift

    ar = jnp.arange(target_length)
    idx_long = offsets[:, None] + ar[None, :]          # [3, target]
    idx_short = jnp.broadcast_to(
        (ar % jnp.maximum(m_true, 1))[None, :], (3, target_length))
    idx = jnp.where(m_true > target_length, idx_long, idx_short)
    fusion = mel[idx]                                  # [3, target, bins]
    fusion = fusion.transpose(0, 2, 1)                 # [3, bins, target]
    return (fusion - audio_mean) / (audio_std * 2.0)


def audio_model_input(waveform: "np.ndarray", cfg: FbankConfig,
                      target_length: int, chunk_indices,
                      audio_mean: float, audio_std: float):
    """Bucketed host entry: [n] float32 waveform -> [3, bins, target].
    One XLA program per waveform-length bucket (ops.bucketing), exact for
    any true length. chunk_indices as in `waveform_to_model_input`."""
    from .bucketing import WAVEFORM_LADDER, bucket_up, pad_to
    wav = np.asarray(waveform, np.float32)
    n = wav.shape[0]
    nb = bucket_up(max(n, cfg.window_size), WAVEFORM_LADDER)
    wav_p = pad_to(wav, (nb,))
    return _audio_kernel(jnp.asarray(wav_p), jnp.int32(n),
                         jnp.asarray(chunk_indices, jnp.int32), cfg,
                         target_length, jnp.float32(audio_mean),
                         jnp.float32(audio_std))


def kaldi_fbank_host(waveform: np.ndarray,
                     cfg: FbankConfig = FbankConfig()) -> np.ndarray:
    """numpy twin of `kaldi_fbank` for the loader hot path: a per-sample
    synchronous device round-trip costs ~290 ms on the tunneled platform
    (scripts, round 2) vs a few ms of host FFT."""
    wav = np.asarray(waveform, np.float32)
    m = num_frames(wav.shape[0], cfg)
    ws, shift = cfg.window_size, cfg.window_shift
    idx = (np.arange(m) * shift)[:, None] + np.arange(ws)[None, :]
    frames = wav[idx]                                       # [m, ws]
    if cfg.remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if cfg.preemphasis:
        prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - cfg.preemphasis * prev
    frames = frames * _hann(ws)
    pad = cfg.padded_window_size - ws
    frames = np.pad(frames, ((0, 0), (0, pad)))
    spectrum = np.abs(np.fft.rfft(frames, axis=1)).astype(np.float32) ** 2
    energies = spectrum @ mel_banks(cfg).T                  # [m, bins]
    eps = np.finfo(np.float32).eps
    return np.log(np.maximum(energies, eps)).astype(np.float32)


def audio_model_input_host(waveform: np.ndarray, cfg: FbankConfig,
                           target_length: int, chunk_indices,
                           audio_mean: float, audio_std: float):
    """numpy twin of `audio_model_input` (same chunk/tile/normalize
    semantics as `waveform_to_model_input`)."""
    mel = kaldi_fbank_host(waveform, cfg)                   # [T, bins]
    T = mel.shape[0]
    if T > target_length:
        chunks = [mel[i:i + target_length] for i in chunk_indices]
        fusion = np.stack(chunks, axis=0)
    elif T < target_length:
        n_repeat = int(target_length / T) + 1
        rep = np.tile(mel, (n_repeat, 1))[:target_length]
        fusion = np.stack([rep, rep, rep], axis=0)
    else:
        fusion = np.stack([mel, mel, mel], axis=0)
    fusion = fusion.transpose(0, 2, 1)                      # [3, bins, tgt]
    return ((fusion - audio_mean) / (audio_std * 2.0)).astype(np.float32)


def chunk_ranges(total_frames: int, target_length: int):
    """The three np.array_split ranges the reference samples chunk starts
    from (audio/processing_audio.py:60-68)."""
    ranges = np.array_split(list(range(0, total_frames - target_length + 1)),
                            3)
    r0 = ranges[0]
    r1 = ranges[1] if len(ranges[1]) else [0]
    r2 = ranges[2] if len(ranges[2]) else [0]
    return r0, r1, r2
