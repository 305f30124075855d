"""Converter coverage for the video-tower extras: temporal attention
modules, peft-LoRA wrapped names, tube-3D conv weights, and the contrastive
clip_loss."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.core.config import tiny_tower
from missm_tpu.compat.convert import convert_tower_state_dict
from missm_tpu.models.tower import vision_features
from missm_tpu.train.contrastive import clip_loss


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32) * 0.02


def _mk_video_state_dict(rng, cfg, lora=False, peft_prefix=False):
    """Synthesize a LanguageBind-video-style torch state dict (numpy)."""
    t, v = cfg.text, cfg.vision
    d, dt = v.hidden_size, t.hidden_size
    sd = {}

    def lin(prefix, din, dout, with_lora=False):
        sd[prefix + ".weight"] = _rand(rng, dout, din)
        sd[prefix + ".bias"] = _rand(rng, dout)
        if with_lora:
            sd[prefix + ".lora_A.default.weight"] = _rand(rng, 2, din)
            sd[prefix + ".lora_B.default.weight"] = np.zeros((dout, 2),
                                                             np.float32)

    def ln(prefix, dim):
        sd[prefix + ".weight"] = np.ones(dim, np.float32)
        sd[prefix + ".bias"] = np.zeros(dim, np.float32)

    # text
    sd["text_model.embeddings.token_embedding.weight"] = _rand(
        rng, t.vocab_size, dt)
    sd["text_model.embeddings.position_embedding.weight"] = _rand(
        rng, t.max_position_embeddings, dt)
    for i in range(t.num_layers):
        p = f"text_model.encoder.layers.{i}."
        ln(p + "layer_norm1", dt)
        ln(p + "layer_norm2", dt)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(p + "self_attn." + nm, dt, dt)
        lin(p + "mlp.fc1", dt, t.intermediate_size)
        lin(p + "mlp.fc2", t.intermediate_size, dt)
    ln("text_model.final_layer_norm", dt)

    # vision with temporal extras (peft wraps the encoder when lora)
    vp = "vision_model."
    ep = vp + ("encoder.base_model.model." if peft_prefix else "encoder.")
    sd[vp + "embeddings.class_embedding"] = _rand(rng, d)
    sd[vp + "embeddings.patch_embedding.weight"] = _rand(
        rng, d, v.num_channels, v.patch_size, v.patch_size)
    sd[vp + "embeddings.position_embedding.weight"] = _rand(
        rng, v.num_patches + 1, d)
    ln(vp + "pre_layrnorm", d)
    ln(vp + "post_layernorm", d)
    for i in range(v.num_layers):
        p = ep + f"layers.{i}."
        ln(p + "layer_norm1", d)
        ln(p + "layer_norm2", d)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(p + "self_attn." + nm, d, d)
        lin(p + "mlp.fc1", d, v.intermediate_size)
        lin(p + "mlp.fc2", v.intermediate_size, d)
        sd[p + "temporal_embedding"] = _rand(rng, 1, v.num_frames, d)
        ln(p + "temporal_layer_norm1", d)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(p + "temporal_attn." + nm, d, d, with_lora=lora)

    sd["visual_projection.weight"] = _rand(rng, cfg.projection_dim, d)
    sd["text_projection.weight"] = _rand(rng, cfg.projection_dim, dt)
    sd["logit_scale"] = np.asarray(2.6592, np.float32)
    return sd


def test_convert_video_tower_runs():
    rng = np.random.default_rng(0)
    cfg = tiny_tower("video")  # add_time_attn, temporal_mlp disabled
    sd = _mk_video_state_dict(rng, cfg)
    params = convert_tower_state_dict(sd, cfg)
    blk = params["vision"]["blocks"]
    assert blk["temporal_embedding"].shape == (2, 4, 32)  # [L, T, D]
    assert "tln1" in blk and "tattn" in blk
    assert "tmlp" not in blk  # video tower: temporal MLP absent
    px = jnp.zeros((2, 3, 4, 32, 32))
    out = vision_features(params["vision"], cfg.vision, px,
                          projection=params["visual_projection"])
    assert out.shape == (2, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_peft_wrapped_lora_names():
    rng = np.random.default_rng(1)
    cfg = tiny_tower("video")
    sd = _mk_video_state_dict(rng, cfg, lora=True, peft_prefix=True)
    params = convert_tower_state_dict(sd, cfg)
    tattn = params["vision"]["blocks"]["tattn"]
    assert "lora_a" in tattn["q"]
    assert tattn["q"]["lora_a"].shape == (2, 32, 2)
    # B zero -> zero delta: output equals conversion without lora keys
    sd2 = {k: v for k, v in sd.items() if "lora" not in k}
    p2 = convert_tower_state_dict(sd2, cfg)
    px = jnp.asarray(np.random.default_rng(2)
                     .standard_normal((1, 3, 4, 32, 32)).astype(np.float32))
    a = vision_features(params["vision"], cfg.vision, px)
    b = vision_features(p2["vision"], cfg.vision, px)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_clip_loss_perfect_alignment():
    logits = jnp.eye(4) * 20.0  # strongly diagonal -> near-zero loss
    assert float(clip_loss(logits)) < 1e-3
    logits_bad = jnp.roll(jnp.eye(4) * 20.0, 1, axis=1)
    assert float(clip_loss(logits_bad)) > 5.0
