"""A/B the fused ln2->fc1 kernel (kernels.ln_linear) on the production
24-layer image block stack at b64: eval forward and train fwd+bwd
(save_attn_mlp_qkv), bench methodology (in-jit fori_loop, loss-chained,
min-of-3). The unfused arm monkeypatches ln_linear_available to False.

Run: python scripts/ln_linear_probe.py [iters]
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
from missm_tpu.kernels import ln_linear as lnmod
from missm_tpu.models.tower import _encoder, init_vision_params
from missm_tpu.ops.basic import get_activation

B = 64
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10

cfg = languagebind_large("image").vision
N = cfg.num_patches + 1
D = cfg.hidden_size
H = cfg.num_heads
SCALING = cfg.lora_alpha / cfg.lora_r if cfg.lora_r else None
ACT = get_activation(cfg.hidden_act)


def timed(tag, loop, *args):
    jloop = jax.jit(loop)
    float(jnp.asarray(jloop(*args), jnp.float32))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(jloop(*args), jnp.float32))
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"{tag:16s}: {best * 1e3:7.2f} ms/stack", flush=True)
    return best


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16)
        if t.dtype == jnp.float32 else t, params)
    blocks = params["blocks"]

    def stack(blocks, x, remat=False):
        return _encoder(blocks, x, num_heads=H, act=ACT,
                        eps=cfg.layer_norm_eps, lora_scaling=SCALING,
                        remat=remat)

    def fwd_loop(blocks, x):
        def it(i, c):
            h = stack(blocks, c * (1.0 + 0.0 * i))
            return c + 1e-20 * h.astype(c.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, it, x)
                       .astype(jnp.float32))

    def bwd_loop(blocks, x):
        def loss(x):
            h = stack(blocks, x, remat="save_attn_mlp_qkv")
            return jnp.sum(h.astype(jnp.float32))

        def it(i, c):
            g = jax.grad(loss)(c * (1.0 + 0.0 * i))
            return c + 1e-20 * g.astype(c.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, it, x)
                       .astype(jnp.float32))

    results = {}
    try:
        for arm in ("unfused", "fused"):
            # the trace-time production switch (models.tower reads it on
            # every trace), so both arms run the REAL block path
            lnmod.FUSE_LN2_FC1 = arm == "fused"
            results[f"{arm}_fwd"] = timed(f"{arm} fwd", fwd_loop, blocks,
                                          x0)
            results[f"{arm}_fwdbwd"] = timed(f"{arm} fwd+bwd", bwd_loop,
                                             blocks, x0)
    finally:
        lnmod.FUSE_LN2_FC1 = False
    for k in ("fwd", "fwdbwd"):
        d = (results[f"unfused_{k}"] - results[f"fused_{k}"]) * 1e3
        print(f"{k}: fused saves {d:+.2f} ms/stack")


if __name__ == "__main__":
    main()
