"""Attribute the 3-tower (video+audio+language) eval step's time.

bench.py eval3 runs at B=16: video = ViT-L over 16x8 frame instances with
per-layer temporal attention (128-token packed kernel), audio = ViT-L
over a 593-token rectangular mel grid. This probe times each tower alone
(chained-dependency methodology) plus a video variant with temporal
attention knocked out, to split spatial vs temporal cost."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.core.config import languagebind_large
from missm_tpu.models.finetune import ModelConfig, init_model_params
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.models.tower import vision_features
from missm_tpu.train.step import make_eval_step

B = 16
ITERS = 10


def chain_time(fn, x, iters=ITERS, warmup=2):
    for _ in range(warmup):
        out = fn(x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        x = x + (leaf.ravel()[0] * 0).astype(x.dtype)
    float(jnp.asarray(leaf, jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        x = x + (leaf.ravel()[0] * 0).astype(x.dtype)
    float(jnp.asarray(leaf, jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    enable_compilation_cache()
    vid_cfg = languagebind_large("video")
    aud_cfg = languagebind_large("audio")
    towers = (("video", vid_cfg), ("audio", aud_cfg))
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "video", "audio"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    rng = np.random.default_rng(0)
    ids = np.full((B, 77), 49407, np.int32)
    ids[:, 0] = 49406
    data = {
        "language": jnp.asarray(ids),
        "video": jnp.asarray(rng.standard_normal((B, 3, 8, 224, 224)),
                             jnp.bfloat16),
        "audio": jnp.asarray(rng.standard_normal((B, 3, 112, 1036)),
                             jnp.bfloat16),
    }
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    missing = jnp.asarray(rng.choice([0, 1, 2, 3], B), jnp.int32)

    step = make_eval_step(cfg)
    full = chain_time(
        lambda v: step(params, dict(data, video=v), labels, missing),
        data["video"])
    print(f"full eval3 step        : {full:7.2f} ms "
          f"({B / full * 1e3:.1f} samples/s)")

    @jax.jit
    def vid(p, x):
        return vision_features(p["vision"], vid_cfg.vision, x,
                               projection=p["proj"])

    t = chain_time(lambda x: vid(params["encoder"]["video"], x),
                   data["video"])
    print(f"video tower            : {t:7.2f} ms")

    # temporal attention knocked out (same spatial work, no time mixing)
    vcfg_nt = dataclasses.replace(vid_cfg.vision, add_time_attn=False)
    vp = params["encoder"]["video"]["vision"]
    blocks_nt = {k: v for k, v in vp["blocks"].items()
                 if k in ("ln1", "attn", "ln2", "mlp")}
    vp_nt = dict(vp, blocks=blocks_nt)

    @jax.jit
    def vid_nt(p0, proj, x):
        return vision_features(p0, vcfg_nt, x, projection=proj)

    t_nt = chain_time(
        lambda x: vid_nt(vp_nt, params["encoder"]["video"]["proj"], x),
        data["video"])
    print(f"video tower (no t-attn): {t_nt:7.2f} ms")

    @jax.jit
    def aud(p, x):
        return vision_features(p["vision"], aud_cfg.vision, x,
                               projection=p["proj"])

    t_a = chain_time(lambda x: aud(params["encoder"]["audio"], x),
                     data["audio"])
    print(f"audio tower            : {t_a:7.2f} ms")


if __name__ == "__main__":
    main()
