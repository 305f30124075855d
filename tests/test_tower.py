"""Tower parity vs HF transformers CLIPModel (the reference towers are built
from HF CLIP parts — reference image/modeling_image.py:11-12), plus shape and
variant coverage for the LanguageBind extras."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.core.config import tiny_tower, TextConfig, VisionConfig, TowerConfig
from missm_tpu.models.tower import (
    init_tower_params, text_features, vision_features, tower_forward,
)
from missm_tpu.compat.convert import convert_tower_state_dict


def _small_hf_clip():
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        text_config={
            "vocab_size": 99, "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "max_position_embeddings": 16, "hidden_act": "quick_gelu",
            # newer HF pools on the eos_token_id position; the reference's
            # vendored copy pools on plain argmax of ids (modeling_image.py
            # :519-522). Make them agree: eos == max id, present in inputs.
            "eos_token_id": 98, "bos_token_id": 0, "pad_token_id": 1,
        },
        vision_config={
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": 32, "patch_size": 16, "hidden_act": "quick_gelu",
        },
        projection_dim=24,
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    return model


def _matching_cfg():
    return TowerConfig(
        text=TextConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=2, max_position_embeddings=16,
                        projection_dim=24),
        vision=VisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                            num_heads=2, image_size=(32, 32), patch_size=16,
                            projection_dim=24, lora_r=0),
        projection_dim=24,
    )


@pytest.fixture(scope="module")
def hf_and_jax():
    model = _small_hf_clip()
    cfg = _matching_cfg()
    params = convert_tower_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def test_text_feature_parity(hf_and_jax):
    import torch
    model, cfg, params = hf_and_jax
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 98, size=(3, 16))
    ids[:, -1] = 98  # EOT = max id
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.tensor(ids)).numpy()
    _, got = text_features(params["text"], cfg.text, jnp.asarray(ids),
                           projection=params["text_projection"])
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_image_feature_parity(hf_and_jax):
    import torch
    model, cfg, params = hf_and_jax
    rng = np.random.default_rng(2)
    px = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(pixel_values=torch.tensor(px)).numpy()
    got = vision_features(params["vision"], cfg.vision, jnp.asarray(px),
                          projection=params["visual_projection"])
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_contrastive_logits_parity(hf_and_jax):
    import torch
    model, cfg, params = hf_and_jax
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 98, size=(2, 16))
    ids[:, -1] = 98
    px = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(px))
    lpi, lpt, te, ie = tower_forward(params, cfg, jnp.asarray(ids),
                                     jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(lpt),
                               out.logits_per_text.numpy(), atol=1e-4,
                               rtol=1e-4)


def test_text_attention_mask_parity(hf_and_jax):
    """Padded sequences: the attention_mask must combine with the causal
    mask exactly as HF does (pad keys excluded)."""
    import torch
    model, cfg, params = hf_and_jax
    rng = np.random.default_rng(9)
    ids = rng.integers(1, 98, size=(3, 16))
    mask = np.ones((3, 16), np.int64)
    ids[0, 6:] = 1          # pad tail with pad_token
    ids[0, 5] = 98          # eos before the padding
    mask[0, 6:] = 0
    ids[1, -1] = 98
    ids[2, 10:] = 1
    ids[2, 9] = 98
    mask[2, 10:] = 0
    with torch.no_grad():
        ref = model.get_text_features(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask)).numpy()
    _, got = text_features(params["text"], cfg.text, jnp.asarray(ids),
                           jnp.asarray(mask),
                           projection=params["text_projection"])
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_video_tower_shapes():
    cfg = tiny_tower("video")
    params = init_tower_params(jax.random.PRNGKey(0), cfg)
    px = jnp.zeros((2, 3, 4, 32, 32))  # B C T H W
    out = vision_features(params["vision"], cfg.vision, px,
                          projection=params["visual_projection"])
    assert out.shape == (2, 24)


def test_tube3d_tower_shapes():
    cfg = tiny_tower("video", use_tube3d=True, tube_size=2)
    params = init_tower_params(jax.random.PRNGKey(0), cfg)
    px = jnp.zeros((2, 3, 4, 32, 32))
    out = vision_features(params["vision"], cfg.vision, px,
                          projection=params["visual_projection"])
    assert out.shape == (2, 24)


def test_audio_rectangular_grid():
    cfg = tiny_tower("audio")  # image_size (32, 48), patch 16 -> grid 2x3
    assert cfg.vision.grid == (2, 3)
    params = init_tower_params(jax.random.PRNGKey(0), cfg)
    px = jnp.zeros((2, 3, 32, 48))
    out = vision_features(params["vision"], cfg.vision, px,
                          projection=params["visual_projection"])
    assert out.shape == (2, 24)


def test_patch_dropout_train_only():
    cfg = tiny_tower("image", force_patch_dropout=0.5)
    params = init_tower_params(jax.random.PRNGKey(0), cfg)
    px = jnp.ones((2, 3, 32, 32))
    eval_out = vision_features(params["vision"], cfg.vision, px)
    train_out = vision_features(params["vision"], cfg.vision, px, train=True,
                                rng=jax.random.PRNGKey(1))
    assert eval_out.shape == train_out.shape == (2, 32)
    # dropout must actually change the pooled value in training mode
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))


def test_lora_params_present_and_zero_delta():
    """LoRA starts at zero delta (peft B=0): a tower with lora_r>0 must give
    the same output as lora_r=0 with the same base weights."""
    cfg_lora = tiny_tower("image")  # lora_r=2
    params = init_tower_params(jax.random.PRNGKey(0), cfg_lora)
    blk = jax.tree_util.tree_map(lambda x: x, params["vision"]["blocks"])
    assert "lora_a" in blk["attn"]["q"], "vision attn should carry LoRA"
    px = jnp.ones((1, 3, 32, 32))
    out = vision_features(params["vision"], cfg_lora.vision, px)
    # zero-out lora_b is already zero at init; perturb lora_a only -> no change
    blk["attn"]["q"] = dict(blk["attn"]["q"],
                            lora_a=blk["attn"]["q"]["lora_a"] + 1.0)
    params2 = dict(params, vision=dict(params["vision"], blocks=blk))
    out2 = vision_features(params2["vision"], cfg_lora.vision, px)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_vision_chunking_equivalence():
    """Chunked execution (64-instance programs on TPU) is numerically
    identical to the single-program path in eval mode, including an
    uneven final chunk."""
    import dataclasses
    cfg = tiny_tower("video")
    params = init_tower_params(jax.random.PRNGKey(0), cfg)
    px = jnp.asarray(np.random.default_rng(0).standard_normal(
        (5, 3, 4, 32, 32)), jnp.float32)  # 5 videos x 4 frames = 20 inst
    whole = vision_features(params["vision"], cfg.vision, px,
                            projection=params["visual_projection"])
    ccfg = dataclasses.replace(cfg.vision, chunk_instances=8)  # 2-video chunks
    chunked = vision_features(params["vision"], ccfg, px,
                              projection=params["visual_projection"])
    np.testing.assert_allclose(np.asarray(whole), np.asarray(chunked),
                               rtol=0, atol=1e-6)


def test_patch_dropout_chunk_invariant_7d():
    """7-D retrieval-pair layout: each outer row holds pair*bs videos, so
    the chunk row_offset must advance in VIDEO units — chunked train-mode
    dropout must equal the unchunked stream (the 5-D case is covered by
    the fold_in design; this pins the 7-D rescale)."""
    import dataclasses
    cfg = tiny_tower("video", force_patch_dropout=0.5)
    vcfg = dataclasses.replace(cfg.vision, use_tube3d=False)
    params = init_tower_params(jax.random.PRNGKey(0), cfg)
    px = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 2, 2, 1, 3, 32, 32)), jnp.float32)  # b=4 pair=2 T=2 bs=1
    rng = jax.random.PRNGKey(3)
    whole = vision_features(params["vision"], vcfg, px, train=True, rng=rng,
                            projection=params["visual_projection"])
    # inst_per = pair*T*bs = 4 -> per_chunk = 2 outer rows, 2 chunks
    ccfg = dataclasses.replace(vcfg, chunk_instances=8)
    chunked = vision_features(params["vision"], ccfg, px, train=True,
                              rng=rng,
                              projection=params["visual_projection"])
    np.testing.assert_allclose(np.asarray(whole), np.asarray(chunked),
                               rtol=0, atol=1e-6)
