"""3-tower TRAIN-step probe: video (8-frame, temporal attention) + audio
(112x1036 mel) + language towers, sum fusion, Adam, LoRA-frozen bases,
save_attn_mlp remat — the reference's AVE/eNTERFACE training workload
(train_ddp.py:215-259 over MMDataset_AVE). Validates the fused backward
kernels (cls-split spatial, block-diag packed temporal) under AD on the
real chip and reports samples/s/chip with in-jit fori_loop timing.
"""
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

ITERS = 5
# frozen_bf16 is recognized anywhere on the command line (and removed
# before positional parsing — it must never be consumed as B or REMAT)
FROZEN_BF16 = "frozen_bf16" in sys.argv[1:]
sys.argv = [a for a in sys.argv if a != "frozen_bf16"]
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
# save_attn_mlp's saved fc1 pre-activations are 24*(8B)*257*4096*2B for the
# video tower — 6 GB at B=16 (OOM w/ XLA remat-compression copy pairs);
# full per-block remat is the right default at video instance counts.
REMAT = sys.argv[2] if len(sys.argv) > 2 else True
if REMAT == "True":
    REMAT = True
elif isinstance(REMAT, str):
    # routes through the CLI parser either way so a typo'd policy or a
    # stray argument in the REMAT slot errors instead of silently
    # measuring something else (uniform policies are validated too)
    from missm_tpu.compat.args import _remat, _remat_value
    REMAT = _remat(REMAT) if "=" in REMAT else _remat_value(REMAT)


def main():
    enable_compilation_cache()
    towers = (("video", languagebind_large("video")),
              ("audio", languagebind_large("audio")))
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "video", "audio"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion,
                      compute_dtype="bfloat16", remat=REMAT)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    if FROZEN_BF16:
        from missm_tpu.train.trainability import cast_frozen_params
        params = cast_frozen_params(params, cfg)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx)

    rng = np.random.default_rng(0)
    ids = np.full((B, 77), 49407, np.int32)
    ids[:, 0] = 49406
    ids[:, 1:12] = rng.integers(1, 40000, size=(B, 11))
    data = {
        "language": jnp.asarray(ids),
        "video": jnp.asarray(rng.standard_normal((B, 3, 8, 224, 224)),
                             dtype=jnp.float32),
        "audio": jnp.asarray(rng.standard_normal((B, 3, 112, 1036)),
                             dtype=jnp.float32),
    }
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    missing = jnp.asarray(rng.choice([0, 1, 2, 3], B), jnp.int32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def loop(state, data, labels, missing, key):
        def body(i, carry):
            state, acc = carry
            state, m = step(state, data, labels, missing, 1e-4, key)
            return (state, acc + m["loss"].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, ITERS, body, (state, jnp.float32(0)))
        return acc

    t0 = time.perf_counter()
    float(jnp.asarray(loop(state, data, labels, missing, key), jnp.float32))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(loop(state, data, labels, missing, key),
                          jnp.float32))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    dt = best
    print(f"train3 B={B} remat={REMAT}: {dt * 1e3:.1f} ms/step = "
          f"{B / dt:.2f} samples/s/chip", flush=True)


if __name__ == "__main__":
    main()
