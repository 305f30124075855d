"""Predictor serving API: jit-once batched inference, partial-batch
padding, raw-sample collation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.core.config import tiny_tower
from missm_tpu.data.tokenizer import HashTokenizer
from missm_tpu.eval.predictor import Predictor
from missm_tpu.models.finetune import ModelConfig, init_model_params
from missm_tpu.models.fusion import FusionConfig
from tests.synthetic import synthetic_image_loader


def _setup():
    towers = (("image", tiny_tower("image")),)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=3, feature_dims=24, fusion_dim=8)
    cfg = ModelConfig(towers=towers, fusion=fusion)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_predict_arrays_partial_batch():
    cfg, params = _setup()
    pred = Predictor(params, cfg, batch_size=8)
    rng = np.random.default_rng(0)
    data = {
        "language": jnp.asarray(rng.integers(1, 98, (5, 16)), jnp.int32),
        "image": jnp.asarray(rng.standard_normal((5, 3, 32, 32)),
                             jnp.float32),
    }
    preds, probs = pred.predict_arrays(data)
    assert preds.shape == (5,)
    assert probs.shape == (5, 3)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)


def test_predict_raw_samples():
    cfg, params = _setup()
    pred = Predictor(params, cfg, batch_size=4,
                     tokenizer=HashTokenizer(99, 16),
                     media_loaders={"image": synthetic_image_loader()})
    samples = [{"language": f"text {i}", "image": f"/fake/{i}.jpg"}
               for i in range(10)]
    preds, probs = pred.predict(samples)
    assert preds.shape == (10,)
    assert probs.shape == (10, 3)
    # deterministic: same inputs -> same outputs
    preds2, probs2 = pred.predict(samples)
    np.testing.assert_array_equal(preds, preds2)
    np.testing.assert_allclose(probs, probs2, atol=0)


def test_predict_arrays_rejects_oversized_batch():
    """A batch larger than the compiled batch_size must raise a clear
    error (negative-pad np.repeat used to fail deep inside padding)."""
    cfg, params = _setup()
    p = Predictor(params, cfg, batch_size=2)
    data = {"image": np.zeros((5, 3, 32, 32), np.float32),
            "language": np.ones((5, 16), np.int32)}
    with pytest.raises(ValueError, match="compiled batch_size"):
        p.predict_arrays(data)
