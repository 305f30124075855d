"""Attribute the temporal-attention overhead inside the video tower.

eval3_knockout_probe shows temporal attention costs ~62 ms over the
spatial-only stack (24 layers, B=16, T=8, N=257, D=1024) against a ~34 ms
qkv/out matmul floor. This probe times the pieces in isolation with the
chained-dependency methodology: the [B,T,N,D]<->[B,N,T,D] relayout pair,
the packed short_attention (projections + fused kernel), the projections
alone, and the text tower / fusion remainder of the eval3 step.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.core.config import languagebind_large
from missm_tpu.models.tower import text_features
from missm_tpu.ops.attention import short_attention
from missm_tpu.ops.basic import linear  # noqa: F401 (import check)

B, T, N, D, H, L = 16, 8, 257, 1024, 16, 24
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
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B * T, N, D)), jnp.bfloat16)

    @jax.jit
    def transposes(x):
        h = x
        for _ in range(L):
            ht = h.reshape(-1, T, N, D).transpose(0, 2, 1, 3).reshape(-1, T, D)
            ht = ht * (1 + 1e-6)  # keep both transposes live
            h = h + ht.reshape(-1, N, T, D).transpose(0, 2, 1, 3).reshape(
                -1, N, D) * 1e-6
        return h

    print(f"{L}x relayout pair      : {chain_time(transposes, x):7.2f} ms")

    kq = jax.random.split(jax.random.PRNGKey(0), 4)
    p = {n: {"w": jax.random.normal(k, (D, D), jnp.bfloat16) * 0.02,
             "b": jnp.zeros((D,), jnp.bfloat16)}
         for n, k in zip(("q", "k", "v", "out"), kq)}

    xt = jnp.asarray(rng.standard_normal((B * N, T, D)), jnp.bfloat16)

    @jax.jit
    def sattn(x):
        h = x
        for _ in range(L):
            h = h + short_attention(p, h, num_heads=H) * 1e-3
        return h

    print(f"{L}x short_attention    : {chain_time(sattn, xt):7.2f} ms")

    @jax.jit
    def projs(x):
        h = x
        for _ in range(L):
            q = jnp.dot(h, p["q"]["w"])
            k_ = jnp.dot(h, p["k"]["w"])
            v = jnp.dot(h, p["v"]["w"])
            h = h + jnp.dot(q * k_ * v * 1e-6, p["out"]["w"]) * 1e-3
        return h

    print(f"{L}x qkv+out proj only  : {chain_time(projs, xt):7.2f} ms")

    # text tower + fusion remainder
    txt_cfg = languagebind_large("video").text
    from missm_tpu.models.tower import init_text_params
    tp = init_text_params(jax.random.PRNGKey(1), txt_cfg)
    tp = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, tp)
    ids = np.full((B, 77), 49407, np.int32)
    ids[:, 0] = 49406
    idsj = jnp.asarray(ids)

    @jax.jit
    def txt(ids):
        return jax.tree_util.tree_leaves(text_features(tp, txt_cfg, ids))[0]

    for _ in range(2):
        o = txt(idsj)
    float(jnp.asarray(o, jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        o = txt(idsj)
        idsj = idsj + (o.ravel()[0] * 0).astype(idsj.dtype)
    float(jnp.asarray(o, jnp.float32).ravel()[0])
    print(f"text tower             : {(time.perf_counter()-t0)/ITERS*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
