# Group-size ablation for the scratch-batched attention kernel.
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.config import languagebind_large
from missm_tpu.models.tower import init_vision_params
from missm_tpu.ops.basic import get_activation, layer_norm, linear
from missm_tpu.kernels.flash_attention import fused_attention

B = 64
cfg = languagebind_large("image").vision
N = cfg.num_patches + 1
D = cfg.hidden_size
H = cfg.num_heads


def timeit(f, *args, iters=10):
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def make_tower(group):
    act = get_activation(cfg.hidden_act)

    def block(p, x):
        h = layer_norm(p["ln1"], x, 1e-5)
        q = linear(p["attn"]["q"], h)
        k = linear(p["attn"]["k"], h)
        v = linear(p["attn"]["v"], h)
        a = fused_attention(q, k, v, H, group=group)
        x = x + linear(p["attn"]["out"], a)
        h = layer_norm(p["ln2"], x, 1e-5)
        x = x + linear(p["mlp"]["fc2"], act(linear(p["mlp"]["fc1"], h)))
        return x

    @jax.jit
    def run(params, x):
        def body(h, p):
            return block(p, h), None
        h, _ = jax.lax.scan(body, x, params["blocks"])
        return h

    return run


def main():
    params = init_vision_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, N, D)),
                    dtype=jnp.bfloat16)
    for g in (2, 4, 8):
        dt = timeit(make_tower(g), params, x)
        print(f"group={g}: {dt * 1000:.1f} ms ({B / dt:.0f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
