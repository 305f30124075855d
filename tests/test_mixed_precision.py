"""bf16 compute policy, LoRA injection on converted params, 7-D input
dispatch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.core.config import tiny_tower
from missm_tpu.models.finetune import (ModelConfig, init_model_params,
                                       model_forward)
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.models.tower import init_tower_params, inject_lora, \
    vision_features


def _cfg(compute_dtype="float32"):
    towers = (("image", tiny_tower("image")),)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=3, feature_dims=24, fusion_dim=8)
    return ModelConfig(towers=towers, fusion=fusion,
                       compute_dtype=compute_dtype)


def test_bf16_forward_close_to_f32():
    params = init_model_params(jax.random.PRNGKey(0), _cfg())
    rng = np.random.default_rng(0)
    data = {
        "language": jnp.asarray(rng.integers(1, 98, (4, 16)), jnp.int32),
        "image": jnp.asarray(rng.standard_normal((4, 3, 32, 32)),
                             jnp.float32),
    }
    missing = jnp.zeros((4,), jnp.int32)
    f32, _ = model_forward(params, _cfg("float32"), data, missing)
    bf16, _ = model_forward(params, _cfg("bfloat16"), data, missing)
    assert bf16.dtype == jnp.float32  # fusion head stays f32
    np.testing.assert_allclose(np.asarray(f32), np.asarray(bf16), atol=0.15,
                               rtol=0.1)


def test_inject_lora_zero_delta():
    """Freshly injected LoRA (B=0) must leave the forward unchanged."""
    cfg = tiny_tower("image", lora_r=0)
    params = init_tower_params(jax.random.PRNGKey(0), cfg)
    px = jnp.asarray(np.random.default_rng(1)
                     .standard_normal((2, 3, 32, 32)).astype(np.float32))
    base = vision_features(params["vision"], cfg.vision, px)

    cfg_l = tiny_tower("image", lora_r=2)
    v_lora = inject_lora(jax.random.PRNGKey(2), params["vision"],
                         cfg_l.vision)
    blk = v_lora["blocks"]
    assert "lora_a" in blk["attn"]["q"]
    assert blk["attn"]["q"]["lora_a"].shape == (2, 32, 2)  # [L, D, r]
    out = vision_features(v_lora, cfg_l.vision, px)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=1e-6)


def test_inject_lora_temporal_targets():
    cfg = tiny_tower("video", lora_r=0)
    params = init_tower_params(jax.random.PRNGKey(0), cfg)
    cfg_l = tiny_tower("video", lora_r=2)
    v = inject_lora(jax.random.PRNGKey(1), params["vision"], cfg_l.vision)
    assert "lora_a" in v["blocks"]["tattn"]["q"]
    assert "lora_a" not in v["blocks"]["attn"]["q"]  # spatial untouched


def test_7d_input_dispatch():
    cfg = tiny_tower("video")
    params = init_tower_params(jax.random.PRNGKey(0), cfg)
    px = jnp.zeros((1, 2, 4, 1, 3, 32, 32))  # (b, pair, T, bs, c, h, w)
    out = vision_features(params["vision"], cfg.vision, px,
                          projection=params["visual_projection"])
    assert out.shape == (2, 24)  # B = b * pair * bs
