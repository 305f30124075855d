"""Ad-hoc perf probe: vision tower throughput across batch sizes on the
real chip. Not part of the test suite."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.config import languagebind_large
from missm_tpu.models.tower import init_vision_params, vision_features


def main():
    cfg = languagebind_large("image").vision
    t0 = time.perf_counter()
    params = init_vision_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    @jax.jit
    def tower(p, px):
        return vision_features(p, cfg, px)

    for B in (64, 128, 256):
        px = jnp.asarray(
            np.random.default_rng(0).standard_normal((B, 3, 224, 224)),
            dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        out = tower(params, px)
        float(jnp.sum(out.astype(jnp.float32)))
        print(f"B={B}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = tower(params, px)
            float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        flops = B * 2 * 303e6 * 257
        print(f"B={B}: {dt * 1000:.1f} ms/step, {B / dt:.0f} img/s, "
              f"~{flops / dt / 1e12:.0f} TFLOPS-equiv", flush=True)


if __name__ == "__main__":
    main()
