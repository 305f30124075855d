"""Static model/tower configuration.

One parameterized CLIP tower config replaces the reference's five copy-pasted
modality packages (`/root/reference/languagebind/*/configuration_*.py`).
Frozen dataclasses are hashable, so they can be closed over by `jax.jit`
without retracing churn.

Reference parity notes (citations into /root/reference):
- vision extras `add_time_attn, num_frames, force_patch_dropout, lora_r,
  lora_alpha, lora_dropout, num_mel_bins, target_length`:
  languagebind/image/configuration_image.py:197-205.
- audio extras `audio_sample_rate/mean/std`:
  languagebind/audio/configuration_audio.py:206-208.
- depth extra `max_depth=10`: languagebind/depth/configuration_depth.py:205.
- text tower hard-sets `add_time_attn=False`:
  languagebind/image/configuration_image.py:105.
- missing-code map duplicated at baseline.py:8, data_loader.py:12-13,
  generate_missing.py:22 — centralised here once.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

# Per-sample scalar missing code: 0 = complete sample.
# (reference: src/model/baseline.py:8)
MODALITY_CODES = {"language": 1, "video": 2, "audio": 3, "image": 4}
CODE_TO_MODALITY = {v: k for k, v in MODALITY_CODES.items()}


@dataclasses.dataclass(frozen=True)
class TextConfig:
    """CLIP text tower (causal mask, EOT pooling)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    projection_dim: int = 768


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """CLIP vision tower with the LanguageBind extras.

    `image_size` is (H, W): the audio tower uses a rectangular grid
    [num_mel_bins, target_length] (reference image/modeling_image.py:797-798);
    every other tower is square.
    """

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    image_size: Tuple[int, int] = (224, 224)
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    projection_dim: int = 768

    # LanguageBind extras (reference configuration_image.py:197-205)
    add_time_attn: bool = False
    num_frames: int = 1
    tube_size: int = 1
    use_tube3d: bool = False  # CLIPVisionEmbeddings3D (video/modeling_video.py:53-130)
    temporal_mlp: bool = True  # video tower disables it (video/modeling_video.py:189-190)
    force_patch_dropout: float = 0.0
    lora_r: int = 2
    lora_alpha: int = 16
    lora_dropout: float = 0.0
    # TPU scheduling knob (no reference counterpart): max ViT instances per
    # sequential chunk inside vision_features; None -> 64 * device_count
    # (64-instance programs measure ~13% faster per instance than 128 on
    # v5e — scripts/video_pieces_probe.py).
    chunk_instances: int | None = None

    @property
    def grid(self) -> Tuple[int, int]:
        return (self.image_size[0] // self.patch_size,
                self.image_size[1] // self.patch_size)

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid
        return gh * gw

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    """A full dual-encoder tower: text + vision + projections + logit scale."""

    text: TextConfig = TextConfig()
    vision: VisionConfig = VisionConfig()
    projection_dim: int = 768
    logit_scale_init: float = 2.6592  # ln(1/0.07), CLIP default

    # host-side preprocessing knobs carried alongside the tower
    # (reference keeps them in the vision config)
    num_mel_bins: int = 0
    target_length: int = 0
    audio_sample_rate: int = 16000
    audio_mean: float = -4.2677393
    audio_std: float = 4.5689974
    max_depth: float = 10.0
    # sampling semantics: decord (reference default,
    # configuration_video.py:205) | opencv | pytorchvideo
    video_decode_backend: str = "decord"


def languagebind_large(modality: str) -> TowerConfig:
    """Config matching the published LanguageBind_* large checkpoints
    (ViT-L/14 towers, 768-d shared projection space)."""
    text = TextConfig(hidden_size=768, intermediate_size=3072, num_layers=12,
                      num_heads=12, projection_dim=768)
    if modality == "audio":
        # rectangular mel-spectrogram grid (reference audio config:
        # num_mel_bins=112, target_length=1036 for LanguageBind_Audio)
        vision = VisionConfig(image_size=(112, 1036), patch_size=14,
                              projection_dim=768)
        return TowerConfig(text=text, vision=vision, num_mel_bins=112,
                           target_length=1036)
    if modality == "video":
        vision = VisionConfig(image_size=(224, 224), patch_size=14,
                              add_time_attn=True, num_frames=8,
                              temporal_mlp=False, projection_dim=768)
        return TowerConfig(text=text, vision=vision)
    # image / depth / thermal: square 224 ViT-L/14
    vision = VisionConfig(image_size=(224, 224), patch_size=14,
                          projection_dim=768)
    return TowerConfig(text=text, vision=vision)


def tiny_tower(modality: str = "image", **overrides) -> TowerConfig:
    """A tiny tower for CPU tests."""
    text = TextConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, max_position_embeddings=16,
                      projection_dim=24)
    vkw = dict(hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
               image_size=(32, 32), patch_size=16, projection_dim=24, lora_r=2)
    if modality == "video":
        vkw.update(add_time_attn=True, num_frames=4, temporal_mlp=False)
    if modality == "audio":
        vkw.update(image_size=(32, 48))
    vkw.update(overrides)
    extras = {}
    if modality == "audio":
        extras = dict(num_mel_bins=32, target_length=48)
    return TowerConfig(text=text, vision=VisionConfig(**vkw),
                       projection_dim=24, **extras)
