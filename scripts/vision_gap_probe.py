"""Locate the gap between the bare 24-block stack and vision_features
(~7 ms unattributed in scripts/eval_knockout_probe.py): time the stack on
a pre-embedded [B, 257, D] input through the PRODUCTION block
(multi_head_attention, cls-split) vs vision_features end-to-end, and try
batch_block amortization of the kernel grid."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.core.config import languagebind_large
from missm_tpu.models.tower import init_vision_params, vision_features, \
    _encoder
from missm_tpu.ops.basic import get_activation

B = 64
cfg = languagebind_large("image").vision
N = cfg.num_patches + 1
D = cfg.hidden_size


def chain_time(fn, x, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(x)
        x = x + (out.ravel()[0] * 0).astype(x.dtype)
    float(jnp.asarray(out, jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
        x = x + (out.ravel()[0] * 0).astype(x.dtype)
    float(jnp.asarray(out, jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    enable_compilation_cache()
    params = init_vision_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x_tok = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    img = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.bfloat16)

    act = get_activation(cfg.hidden_act)
    lora = (cfg.lora_alpha / cfg.lora_r) if cfg.lora_r else None

    @jax.jit
    def stack_only(p, x):
        return _encoder(p["blocks"], x, num_heads=cfg.num_heads, act=act,
                        eps=cfg.layer_norm_eps, lora_scaling=lora)

    @jax.jit
    def vis(p, x):
        return vision_features(p, cfg, x)

    rounds_s, rounds_v = [], []
    for _ in range(3):
        rounds_s.append(chain_time(lambda t: stack_only(params, t), x_tok))
        rounds_v.append(chain_time(lambda t: vis(params, t), img))
    print(f"stack only (production blocks): {min(rounds_s):6.2f} ms  "
          f"{[f'{t:.1f}' for t in rounds_s]}")
    print(f"vision_features end-to-end    : {min(rounds_v):6.2f} ms  "
          f"{[f'{t:.1f}' for t in rounds_v]}")


if __name__ == "__main__":
    main()
