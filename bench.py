"""Benchmark: samples/sec/chip on the flagship model under
modality-dropout masks — eval, train, and the 3-tower (video+audio+
language) eval (VERDICT r1 #9).

Prints ONE JSON line. Primary fields are the image+text eval step (the
metric tracked since BENCH_r01); `extra_metrics` carries the train step
and the 3-tower eval. `vs_baseline` divides by the committed analytic
estimate of the reference stack (PyTorch eager, bf16) on A100-80GB —
derivation in docs/BASELINE_ESTIMATE.md. The reference itself publishes
no numbers (BASELINE.md).

Workloads (LanguageBind-Large scale, bf16, random modality-dropout codes):
- eval:  ViT-L/14 image tower + CLIP text tower + sum fusion, batch 64
- train: same model, Adam, LoRA-frozen base, save_attn_mlp remat, batch 64
- eval3: video (8-frame tube + temporal attn) + audio (112x1036 mel) +
  language towers + sum fusion, batch 16
"""
from __future__ import annotations

import json
import time

import numpy as np

# Analytic A100 estimates (samples/s) — docs/BASELINE_ESTIMATE.md
A100_EVAL_IMAGE_TEXT = 712.0
A100_TRAIN_IMAGE_TEXT = 237.0
A100_EVAL_THREE_TOWER = 58.9


def _text_ids(rng, B):
    ids = np.full((B, 77), 49407, np.int32)
    ids[:, 0] = 49406
    ids[:, 1:12] = rng.integers(1, 40000, size=(B, 11))
    return ids


def _chain(x, out):
    """Carry a zero-valued dependency on `out` into the next iteration's
    input: the tunneled platform's block_until_ready does not synchronize
    and unfetched results may evaluate lazily, so iterations are chained
    and ONE final readback forces the device work (per-step readbacks add
    ~25 ms tunnel RTT each)."""
    import jax.numpy as jnp
    return x + out["loss"].astype(x.dtype) * 0


def bench_eval(jnp, jax, iters=20, B=64):
    from missm_tpu.core.config import languagebind_large
    from missm_tpu.models.finetune import ModelConfig, init_model_params
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

    rng = np.random.default_rng(0)
    data = {
        "language": jnp.asarray(_text_ids(rng, B)),
        "image": jnp.asarray(rng.standard_normal((B, 3, 224, 224)),
                             dtype=jnp.bfloat16),
    }
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    masks = [jnp.asarray(rng.choice([0, 1, 4], B), jnp.int32)
             for _ in range(4)]
    eval_step = make_eval_step(cfg)

    img = data["image"]
    for i in range(3):  # compile + warmup
        out = eval_step(params, dict(data, image=img), labels,
                        masks[i % len(masks)])
        img = _chain(img, out)
    float(out["loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        out = eval_step(params, dict(data, image=img), labels,
                        masks[i % len(masks)])
        img = _chain(img, out)
    float(out["loss"])
    return B * iters / (time.perf_counter() - t0)


def bench_train(jnp, jax, iters=10, B=64):
    from missm_tpu.core.config import languagebind_large
    from missm_tpu.models.finetune import ModelConfig, init_model_params
    from missm_tpu.models.fusion import FusionConfig
    from missm_tpu.train.step import init_train_state, make_train_step

    towers = (("image", languagebind_large("image")),)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion,
                      compute_dtype="bfloat16", remat="save_attn_mlp")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx)

    rng = np.random.default_rng(0)
    data = {
        "language": jnp.asarray(_text_ids(rng, B)),
        "image": jnp.asarray(rng.standard_normal((B, 3, 224, 224)),
                             dtype=jnp.float32),
    }
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    missing = jnp.asarray(rng.choice([0, 1, 4], B), jnp.int32)
    key = jax.random.PRNGKey(0)

    for _ in range(2):  # compile + warmup (state carries the dependency)
        state, m = step(state, data, labels, missing, 1e-4, key)
    float(m["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, data, labels, missing, 1e-4, key)
    float(m["loss"])
    return B * iters / (time.perf_counter() - t0)


def bench_eval3(jnp, jax, iters=10, B=16):
    from missm_tpu.core.config import languagebind_large
    from missm_tpu.models.finetune import ModelConfig, init_model_params
    from missm_tpu.models.fusion import FusionConfig
    from missm_tpu.train.step import make_eval_step

    towers = (("video", languagebind_large("video")),
              ("audio", languagebind_large("audio")))
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "video", "audio"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)

    rng = np.random.default_rng(0)
    data = {
        "language": jnp.asarray(_text_ids(rng, B)),
        "video": jnp.asarray(rng.standard_normal((B, 3, 8, 224, 224)),
                             dtype=jnp.bfloat16),
        "audio": jnp.asarray(rng.standard_normal((B, 3, 112, 1036)),
                             dtype=jnp.bfloat16),
    }
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    # dropout codes over 3 modalities (full/miss-one patterns)
    masks = [jnp.asarray(rng.choice([0, 1, 2, 3], B), jnp.int32)
             for _ in range(4)]
    eval_step = make_eval_step(cfg)

    vid = data["video"]
    for i in range(2):
        out = eval_step(params, dict(data, video=vid), labels,
                        masks[i % len(masks)])
        vid = _chain(vid, out)
    float(out["loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        out = eval_step(params, dict(data, video=vid), labels,
                        masks[i % len(masks)])
        vid = _chain(vid, out)
    float(out["loss"])
    return B * iters / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp

    from missm_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    n = jax.device_count()
    ev = bench_eval(jnp, jax) / n
    tr = bench_train(jnp, jax) / n
    e3 = bench_eval3(jnp, jax) / n

    print(json.dumps({
        "metric": "eval_samples_per_sec_per_chip",
        "value": round(ev, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(ev / A100_EVAL_IMAGE_TEXT, 3),
        "extra_metrics": [
            {"metric": "train_samples_per_sec_per_chip",
             "value": round(tr, 2), "unit": "samples/s/chip",
             "vs_baseline": round(tr / A100_TRAIN_IMAGE_TEXT, 3)},
            {"metric": "eval3_video_audio_language_samples_per_sec_per_chip",
             "value": round(e3, 2), "unit": "samples/s/chip",
             "vs_baseline": round(e3 / A100_EVAL_THREE_TOWER, 3)},
        ],
    }))


if __name__ == "__main__":
    main()
