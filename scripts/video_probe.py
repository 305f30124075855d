# Video tower (temporal attention) throughput on the real chip.
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.core.config import languagebind_large
from missm_tpu.models.tower import init_vision_params, vision_features


def main():
    enable_compilation_cache()
    cfg = languagebind_large("video").vision
    params = init_vision_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)

    @jax.jit
    def tower(p, px):
        return vision_features(p, cfg, px)

    for B in (16,):
        px = jnp.asarray(
            np.random.default_rng(0).standard_normal((B, 3, 8, 224, 224)),
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
        print(f"B={B}: {dt * 1000:.1f} ms/step, {B / dt:.1f} videos/s "
              f"({B * 8 / dt:.0f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
