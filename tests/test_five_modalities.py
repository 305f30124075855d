"""Full 5-modality model (language + image/video/audio/depth/thermal):
encoder + fusion forward and one train step — the widest configuration the
reference's encoder layer supports (depth/thermal have no dropout codes)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.core.config import MODALITY_CODES, tiny_tower
from missm_tpu.models.finetune import (ModelConfig, init_model_params,
                                       model_forward)
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.train.step import init_train_state, make_train_step

B = 4


def five_modality_cfg(fusion_type="sum"):
    towers = (("image", tiny_tower("image")),
              ("video", tiny_tower("video")),
              ("audio", tiny_tower("audio")),
              ("depth", tiny_tower("depth")),
              ("thermal", tiny_tower("thermal")))
    fusion = FusionConfig(
        fusion_type=fusion_type,
        modality_types=("language", "video", "audio", "image", "depth",
                        "thermal"),
        output_dims=3, feature_dims=24, fusion_dim=8)
    return ModelConfig(towers=towers, fusion=fusion)


def five_modality_batch(seed=0):
    rng = np.random.default_rng(seed)
    data = {
        "language": jnp.asarray(rng.integers(1, 98, (B, 16)), jnp.int32),
        "image": jnp.asarray(rng.standard_normal((B, 3, 32, 32)),
                             jnp.float32),
        "video": jnp.asarray(rng.standard_normal((B, 3, 4, 32, 32)),
                             jnp.float32),
        "audio": jnp.asarray(rng.standard_normal((B, 3, 32, 48)),
                             jnp.float32),
        "depth": jnp.asarray(rng.standard_normal((B, 3, 32, 32)),
                             jnp.float32),
        "thermal": jnp.asarray(rng.standard_normal((B, 3, 32, 32)),
                               jnp.float32),
    }
    missing = jnp.asarray([0, MODALITY_CODES["language"],
                           MODALITY_CODES["video"],
                           MODALITY_CODES["audio"]], jnp.int32)
    labels = jnp.asarray(rng.integers(0, 3, B), jnp.int32)
    return data, labels, missing


@pytest.mark.parametrize("ftype", ["sum", "inter_attention", "graph_fusion"])
def test_five_modality_forward(ftype):
    cfg = five_modality_cfg(ftype)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    data, labels, missing = five_modality_batch()
    logits, _ = model_forward(params, cfg, data, missing)
    assert logits.shape == (B, 3)
    assert np.isfinite(np.asarray(logits)).all()


def test_five_modality_train_step():
    cfg = five_modality_cfg("sum")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx)
    data, labels, missing = five_modality_batch()
    state, m = step(state, data, labels, missing, 1e-3, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_depth_thermal_never_missing():
    from missm_tpu.models.fusion import present_matrix
    cfg = five_modality_cfg("sum").fusion
    _, _, missing = five_modality_batch()
    present = np.asarray(present_matrix(cfg, missing))
    depth_col = cfg.modality_types.index("depth")
    thermal_col = cfg.modality_types.index("thermal")
    assert present[:, depth_col].all()
    assert present[:, thermal_col].all()
