"""Golden parity vs the REFERENCE'S OWN video tower code
(languagebind/video/modeling_video.py executed from its mount with a
LoRA-identity peft shim): temporal attention, per-layer temporal embedding,
frame-mean pooling, EOT text pooling — weights converted with
compat.convert and outputs compared bit-near."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from missm_tpu.core.config import tiny_tower
from missm_tpu.compat.convert import convert_tower_state_dict
from missm_tpu.models.tower import text_features, tower_forward, \
    vision_features
from tests.ref_shim import load_reference_tower


@pytest.fixture(scope="module")
def ref_video():
    mod = load_reference_tower("video")
    conf = sys.modules["ref_languagebind_video.configuration_video"]
    cfg = conf.LanguageBindVideoConfig(
        text_config_dict=dict(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16, projection_dim=24),
        vision_config_dict=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16,
            projection_dim=24, add_time_attn=True, num_frames=4, lora_r=0),
        projection_dim=24)
    for c in (cfg, cfg.text_config, cfg.vision_config):
        c._attn_implementation = "eager"
    torch.manual_seed(0)
    model = mod.LanguageBindVideo(cfg).eval()
    my_cfg = tiny_tower("video", lora_r=0)
    params = convert_tower_state_dict(model.state_dict(), my_cfg)
    return model, my_cfg, params


def test_video_vision_parity(ref_video):
    model, cfg, params = ref_video
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.tensor(px)).numpy()
    got = vision_features(params["vision"], cfg.vision, jnp.asarray(px),
                          projection=params["visual_projection"])
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-4)


def test_video_text_parity(ref_video):
    model, cfg, params = ref_video
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 98, size=(3, 16))
    ids[:, -1] = 98
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.tensor(ids)).numpy()
    _, got = text_features(params["text"], cfg.text, jnp.asarray(ids),
                           projection=params["text_projection"])
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-4)


def test_video_contrastive_parity(ref_video):
    model, cfg, params = ref_video
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 98, size=(2, 16))
    ids[:, -1] = 98
    px = rng.standard_normal((2, 3, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(px))
    _, lpt, _, _ = tower_forward(params, cfg, jnp.asarray(ids),
                                 jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(lpt),
                               out.logits_per_text.numpy(), atol=1e-4,
                               rtol=1e-3)


def test_single_frame_input(ref_video):
    """Documented deviation: the reference video tower CRASHES on 4-D
    single-image inputs (its temporal rearrange hard-codes
    config.num_frames — image/modeling_image.py:107 `t = self.t` — so a
    [B, C, H, W] batch cannot be regrouped). Our tower threads the actual
    frame count and handles T=1 (the :110 `if t != 1` gate then skips the
    temporal embedding)."""
    model, cfg, params = ref_video
    rng = np.random.default_rng(3)
    px = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with pytest.raises(Exception):
        with torch.no_grad():
            model.get_image_features(pixel_values=torch.tensor(px))
    got = vision_features(params["vision"], cfg.vision, jnp.asarray(px),
                          projection=params["visual_projection"])
    assert got.shape == (2, 24)
    assert np.isfinite(np.asarray(got)).all()
