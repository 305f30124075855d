"""Shape bucketing for the hot input path.

Real datasets have hundreds of distinct decoded shapes (mvsa photos,
variable-length wavs); jitting transforms on raw shapes means one XLA
compile per shape (minutes each through the TPU tunnel — docs/PERF.md).
Instead every dynamic dimension is padded UP to a bucket from a small
geometric ladder, so the whole dataset compiles a handful of kernel
variants. Exactness is preserved because:

- spatial transforms consume the padded image through resampling weight
  matrices whose padded columns are zero (ops.image_transforms), and
- the audio kernel gathers only the first `n_frames(true_len)` mel rows
  (ops.melfbank.audio_model_input).

Ladder steps grow ~1.25x, capping the padding overhead at ~25% of the
decode FLOPs (the transforms are a rounding error next to the model).
"""
from __future__ import annotations

import numpy as np

# spatial dims (decoded H or W, pixels)
SPATIAL_LADDER = (
    32, 48, 64, 96, 128, 160, 224, 288, 352, 448, 560, 704, 896, 1120,
    1408, 1792, 2240, 2816, 3584, 4480,
)

# waveform lengths (samples @ 16 kHz: 1 s .. 40 s)
WAVEFORM_LADDER = (
    16000, 24000, 32000, 48000, 64000, 96000, 128000, 176000, 240000,
    320000, 480000, 640000,
)


def bucket_up(n: int, ladder=SPATIAL_LADDER) -> int:
    """Smallest ladder value >= n; beyond the ladder, the next multiple of
    the last step."""
    if n <= ladder[-1]:
        for b in ladder:
            if n <= b:
                return b
    step = ladder[-1]
    return ((n + step - 1) // step) * step


def pad_to(x: np.ndarray, shape, value=0) -> np.ndarray:
    """Zero-pad trailing edges of `x` up to `shape` (per-axis targets;
    None keeps the axis)."""
    pads = []
    for dim, tgt in zip(x.shape, shape):
        t = dim if tgt is None else tgt
        if t < dim:
            raise ValueError(f"bucket {t} < dim {dim}")
        pads.append((0, t - dim))
    if not any(p[1] for p in pads):
        return x
    return np.pad(x, pads, constant_values=value)
