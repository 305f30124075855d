# True train-step rate: steps chain through TrainState, one final readback.
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.core.config import languagebind_large
from missm_tpu.models.finetune import ModelConfig, init_model_params
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.train.step import init_train_state, make_train_step


def main():
    enable_compilation_cache()
    towers = (("image", languagebind_large("image")),)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion,
                      compute_dtype="bfloat16", remat=True)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx)

    B = 64
    rng = np.random.default_rng(0)
    ids = np.full((B, 77), 49407, np.int32)
    ids[:, 0] = 49406
    data = {"language": jnp.asarray(ids),
            "image": jnp.asarray(rng.standard_normal((B, 3, 224, 224)),
                                 dtype=jnp.float32)}
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    missing = jnp.asarray(rng.choice([0, 1, 4], B), jnp.int32)

    for i in range(2):
        state, m = step(state, data, labels, missing, 1e-4,
                        jax.random.PRNGKey(i))
    float(m["loss"])

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, data, labels, missing, 1e-4,
                        jax.random.PRNGKey(i))
    float(m["loss"])  # state chains; one readback forces all steps
    dt = (time.perf_counter() - t0) / iters
    print(f"train B={B}: {dt * 1000:.1f} ms/step, {B / dt:.0f} samples/s "
          f"(chained timing)", flush=True)


if __name__ == "__main__":
    main()
