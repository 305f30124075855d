"""Attribute the video tower's spatial-only time (eval3 shapes, B=16).

eval3_knockout_probe: spatial-only video tower = 157 ms, but the b64
image-stack rate predicts ~139 ms for the same 128 ViT-L instances — this
probe isolates the non-stack extras (patchify + embeddings vs an XLA-conv
formulation, final LN/projection/frame pooling) and the 24-layer stack
itself on a pre-made [128, 257, 1024] activation.

Methodology note: params are jit ARGUMENTS (closures embed them as program
constants) and short pieces repeat REPEAT times inside one jit body —
on the tunneled platform each dispatch has ~28 ms RTT that only >=100 ms
of device work hides (docs/PERF.md).
"""
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
from missm_tpu.models.tower import (init_vision_params, vision_features,
                                    _encoder, _patchify2d)
from missm_tpu.ops.basic import get_activation, layer_norm

B, ITERS, REPEAT = 16, 10, 10


def chain_time(fn, p, x, iters=ITERS, warmup=2):
    for _ in range(warmup):
        out = fn(p, x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        x = x + (leaf.ravel()[0] * 0).astype(x.dtype)
    float(jnp.asarray(leaf, jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(p, x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        x = x + (leaf.ravel()[0] * 0).astype(x.dtype)
    float(jnp.asarray(leaf, jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    enable_compilation_cache()
    cfg = dataclasses.replace(languagebind_large("video").vision,
                              add_time_attn=False)
    params = init_vision_params(
        jax.random.PRNGKey(0), languagebind_large("video").vision)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    pnt = dict(params, blocks={k: v for k, v in params["blocks"].items()
                               if k in ("ln1", "attn", "ln2", "mlp")})
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, 3, 8, 224, 224)), jnp.bfloat16)

    t = chain_time(jax.jit(lambda p, x: vision_features(p, cfg, x)), pnt, vid)
    print(f"spatial-only tower       : {t:7.2f} ms")

    h0 = jnp.asarray(rng.standard_normal((B * 8, 257, cfg.hidden_size)),
                     jnp.bfloat16)

    @jax.jit
    def stack(p, h):
        for _ in range(REPEAT):
            h = _encoder(p["blocks"], h, num_heads=cfg.num_heads,
                         act=get_activation(cfg.hidden_act),
                         eps=cfg.layer_norm_eps)
            h = h * (1 + 1e-6)
        return h

    t = chain_time(stack, pnt, h0) / REPEAT
    print(f"24-layer stack (x{REPEAT})    : {t:7.2f} ms")

    d = cfg.hidden_size

    @jax.jit
    def embed_patchify(p, x):
        h = None
        for _ in range(REPEAT):
            frames = x.transpose(0, 2, 1, 3, 4)
            flat = frames.reshape(B * 8, 3, 224, 224)
            patches = _patchify2d(flat, cfg.patch_size)
            emb = jnp.dot(patches, p["patch_embedding"]["w"],
                          preferred_element_type=jnp.float32).astype(x.dtype)
            cls = jnp.broadcast_to(p["class_embedding"][None, None, :],
                                   (B * 8, 1, d))
            e = jnp.concatenate([cls, emb], axis=1) + p["position_embedding"][None]
            e = layer_norm(p["pre_ln"], e, cfg.layer_norm_eps)
            h = e if h is None else h + e
            x = x + e.ravel()[0] * 0
        return h

    t = chain_time(embed_patchify, pnt, vid) / REPEAT
    print(f"embed via patchify (x{REPEAT}): {t:7.2f} ms")

    @jax.jit
    def embed_conv(p, x):
        w = p["patch_embedding"]["w"].reshape(
            3, cfg.patch_size, cfg.patch_size, d)  # (c,i,j) flat -> CHWD
        h = None
        for _ in range(REPEAT):
            frames = x.transpose(0, 2, 1, 3, 4)
            flat = frames.reshape(B * 8, 3, 224, 224)
            emb = jax.lax.conv_general_dilated(
                flat, w, window_strides=(cfg.patch_size, cfg.patch_size),
                padding="VALID",
                dimension_numbers=("NCHW", "IHWO", "NHWC"),
                preferred_element_type=jnp.float32)
            emb = emb.reshape(B * 8, 256, d).astype(x.dtype)
            cls = jnp.broadcast_to(p["class_embedding"][None, None, :],
                                   (B * 8, 1, d))
            e = jnp.concatenate([cls, emb], axis=1) + p["position_embedding"][None]
            e = layer_norm(p["pre_ln"], e, cfg.layer_norm_eps)
            h = e if h is None else h + e
            x = x + e.ravel()[0] * 0
        return h

    t = chain_time(embed_conv, pnt, vid) / REPEAT
    print(f"embed via XLA conv (x{REPEAT}): {t:7.2f} ms")


if __name__ == "__main__":
    main()
