"""Independent, loop-based numpy transcription of Kaldi fbank semantics
(as exposed by torchaudio.compliance.kaldi.fbank with the reference's
arguments: htk_compat=True, hanning, dither=0, use_energy=False,
frame 25 ms / shift 10 ms). Used as the golden for the JAX implementation.

Deliberately structured differently from missm_tpu/ops/melfbank.py
(per-frame python loop, direct DFT definition for small sizes would be too
slow — np.fft is used, but framing/windowing/banks are computed
independently)."""
import numpy as np


def golden_fbank(waveform, sample_rate=16000, num_mel_bins=112,
                 frame_length_ms=25.0, frame_shift_ms=10.0):
    ws = int(sample_rate * frame_length_ms / 1000)
    shift = int(sample_rate * frame_shift_ms / 1000)
    padded = 1
    while padded < ws:
        padded *= 2

    n = len(waveform)
    m = 1 + (n - ws) // shift
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(ws) / (ws - 1))

    rows = []
    for i in range(m):
        fr = np.array(waveform[i * shift: i * shift + ws], dtype=np.float64)
        fr = fr - fr.mean()                       # remove_dc_offset
        pre = np.empty_like(fr)                   # preemphasis 0.97
        pre[0] = fr[0] - 0.97 * fr[0]
        pre[1:] = fr[1:] - 0.97 * fr[:-1]
        fr = pre * window
        fr = np.concatenate([fr, np.zeros(padded - ws)])
        spec = np.abs(np.fft.rfft(fr)) ** 2
        rows.append(spec)
    spectrum = np.stack(rows)                     # (m, padded//2+1)

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    low, high = 20.0, sample_rate / 2.0
    mlo, mhi = mel(low), mel(high)
    d = (mhi - mlo) / (num_mel_bins + 1)
    banks = np.zeros((num_mel_bins, padded // 2 + 1))
    for b in range(num_mel_bins):
        l, c, r = mlo + b * d, mlo + (b + 1) * d, mlo + (b + 2) * d
        for k in range(padded // 2):              # nyquist bin excluded
            fm = mel(sample_rate * k / padded)
            if l < fm < r:
                banks[b, k] = min((fm - l) / (c - l), (r - fm) / (r - c))

    energies = spectrum @ banks.T
    eps = np.finfo(np.float32).eps
    return np.log(np.maximum(energies, eps))


def verify_against_real_torchaudio(trials=8, seed=0):
    """Regeneration / upgrade path (docs/MIGRATION.md "First network
    access"): with torchaudio installed, compare this transcription
    against the REAL `torchaudio.compliance.kaldi.fbank` at the
    reference's arguments (audio/processing_audio.py:100-110). Run:

        pip install torchaudio
        python -m tests.golden_kaldi

    Any disagreement means the transcription (and therefore the
    missm_tpu.ops.melfbank pin) misread Kaldi — fix here, then re-run
    tests/test_melfbank.py."""
    import torch
    import torchaudio.compliance.kaldi as kaldi

    rng = np.random.default_rng(seed)
    worst = 0.0
    for _ in range(trials):
        n = int(rng.integers(1600, 48000))
        wav = rng.standard_normal(n).astype(np.float32)
        ref = kaldi.fbank(
            torch.as_tensor(wav)[None], htk_compat=True,
            sample_frequency=16000, use_energy=False,
            window_type="hanning", num_mel_bins=112, dither=0.0,
            frame_length=25.0, frame_shift=10.0).numpy()
        got = golden_fbank(wav, sample_rate=16000, num_mel_bins=112)
        worst = max(worst, float(np.abs(ref - got).max()))
    print(f"max |delta| vs real torchaudio fbank over {trials} clips: "
          f"{worst:.2e}")
    assert worst < 1e-3, "transcription disagrees with torchaudio/Kaldi"
    print("GOLDEN VERIFIED against real torchaudio")


if __name__ == "__main__":
    verify_against_real_torchaudio()
