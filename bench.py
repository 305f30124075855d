"""Benchmark: eval samples/sec/chip on the flagship model under
modality-dropout masks.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}. The reference publishes no numbers (BASELINE.md), so
vs_baseline is reported against an analytic torch-A100 estimate of the same
workload (see README) — by contract it stays 1.0 until a measured reference
exists.

Workload: LanguageBind ViT-L/14 image tower + CLIP text tower + sum fusion,
bf16, batch 64, random modality-dropout codes per batch — the per-sample
eval step of test.py's sweep loop.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from missm_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from missm_tpu.core.config import languagebind_large
    from missm_tpu.models.finetune import (ModelConfig, init_model_params)
    from missm_tpu.models.fusion import FusionConfig
    from missm_tpu.train.step import make_eval_step

    towers = (("image", languagebind_large("image")),)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion)

    params = init_model_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)

    B = 64
    rng = np.random.default_rng(0)
    ids = np.full((B, 77), 49407, np.int32)
    ids[:, 0] = 49406
    ids[:, 1:12] = rng.integers(1, 40000, size=(B, 11))
    data = {
        "language": jnp.asarray(ids),
        "image": jnp.asarray(rng.standard_normal((B, 3, 224, 224)),
                             dtype=jnp.bfloat16),
    }
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    masks = [jnp.asarray(rng.choice([0, 1, 4], B), jnp.int32)
             for _ in range(4)]

    eval_step = make_eval_step(cfg)

    # compile + warmup. NOTE: the tunneled platform's block_until_ready does
    # not synchronize, and unfetched results may evaluate lazily — so each
    # iteration's input carries a zero-valued dependency on the previous
    # output, and ONE final readback forces the whole chain (per-step
    # readbacks would add tunnel RTT noise to every iteration).
    def chained(img, i):
        out = eval_step(params, dict(data, image=img), labels,
                        masks[i % len(masks)])
        return img + out["loss"].astype(img.dtype) * 0, out

    img = data["image"]
    for i in range(3):
        img, out = chained(img, i)
    float(out["loss"])

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        img, out = chained(img, i)
    float(out["loss"])  # forces the full dependent chain
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    sps = B * iters / dt / n_chips
    print(json.dumps({
        "metric": "eval_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/s/chip",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
