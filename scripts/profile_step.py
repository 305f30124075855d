"""Capture a Perfetto/TensorBoard device trace of the flagship eval and
train steps (view with tensorboard --logdir <out>)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.config import languagebind_large
from missm_tpu.models.finetune import ModelConfig, init_model_params
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.train.step import init_train_state, make_eval_step, \
    make_train_step
from missm_tpu.utils.profiling import trace


def main(out_dir="/tmp/missm_trace"):
    towers = (("image", languagebind_large("image")),)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion,
                      compute_dtype="bfloat16", remat=True)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    state, tx = init_train_state(params, cfg)
    eval_step = make_eval_step(cfg)
    train_step = make_train_step(cfg, tx)

    B = 32
    rng = np.random.default_rng(0)
    ids = np.full((B, 77), 49407, np.int32)
    ids[:, 0] = 49406
    data = {"language": jnp.asarray(ids),
            "image": jnp.asarray(rng.standard_normal((B, 3, 224, 224)),
                                 dtype=jnp.float32)}
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    missing = jnp.zeros((B,), jnp.int32)

    # compile outside the trace
    out = eval_step(state.params, data, labels, missing)
    float(out["loss"])
    state, m = train_step(state, data, labels, missing, 1e-4,
                          jax.random.PRNGKey(0))
    float(m["loss"])

    with trace(out_dir):
        for i in range(3):
            out = eval_step(state.params, data, labels, missing)
            float(out["loss"])
        for i in range(3):
            state, m = train_step(state, data, labels, missing, 1e-4,
                                  jax.random.PRNGKey(i))
            float(m["loss"])
    print(f"trace written to {out_dir}")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
