"""Golden parity vs the reference's own audio tower: rectangular
[num_mel_bins, target_length] patch grid (resize_pos semantics,
image/modeling_image.py:795-841) and spectrogram-shaped inputs."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from missm_tpu.core.config import tiny_tower
from missm_tpu.compat.convert import convert_tower_state_dict
from missm_tpu.models.tower import vision_features
from tests.ref_shim import load_reference_tower


@pytest.fixture(scope="module")
def ref_audio():
    mod = load_reference_tower("audio")
    conf = sys.modules["ref_languagebind_audio.configuration_audio"]
    cfg = conf.LanguageBindAudioConfig(
        text_config_dict=dict(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16, projection_dim=24),
        vision_config_dict=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16,
            projection_dim=24, add_time_attn=False, lora_r=0,
            num_mel_bins=32, target_length=48),
        projection_dim=24)
    for c in (cfg, cfg.text_config, cfg.vision_config):
        c._attn_implementation = "eager"
    torch.manual_seed(0)
    model = mod.LanguageBindAudio(cfg).eval()

    # newer HF CLIPVisionEmbeddings rejects non-square inputs with a strict
    # size check the reference's (older) environment didn't have; disable
    # the check without touching behavior.
    class _AnySize:
        def __ne__(self, other):
            return False

        def __eq__(self, other):
            return True

    model.vision_model.embeddings.image_size = _AnySize()

    my_cfg = tiny_tower("audio", lora_r=0)  # image_size (32, 48), patch 16
    params = convert_tower_state_dict(model.state_dict(), my_cfg)
    return model, my_cfg, params


def test_audio_rectangular_grid_parity(ref_audio):
    model, cfg, params = ref_audio
    # the reference's resize_pos ran at init: 2x2 grid -> 2x3 grid
    assert params["vision"]["position_embedding"].shape == (7, 32)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(pixel_values=torch.tensor(mel)).numpy()
    got = vision_features(params["vision"], cfg.vision, jnp.asarray(mel),
                          projection=params["visual_projection"])
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-4)


def test_resize_position_embedding_vs_reference_math(ref_audio):
    """Feed my converter a pre-resize (square) pos table and check it lands
    on the reference's F.interpolate(bicubic, antialias) output."""
    from missm_tpu.compat.convert import resize_position_embedding
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    pos = rng.standard_normal((5, 32)).astype(np.float32)  # 2x2 grid + CLS
    got = resize_position_embedding(pos, (2, 3))
    grid = torch.tensor(pos[1:]).reshape(1, 2, 2, 32).permute(0, 3, 1, 2)
    ref_grid = F.interpolate(grid, size=(2, 3), mode="bicubic",
                             antialias=True, align_corners=False)
    ref = np.concatenate(
        [pos[:1], ref_grid.permute(0, 2, 3, 1).reshape(6, 32).numpy()])
    np.testing.assert_allclose(got, ref, atol=1e-5)
