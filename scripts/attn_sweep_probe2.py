"""Sweep (head group, batch_block) for the OTHER two hot packed-kernel
shapes (the cls-split N=257 sweep lives in attn_sweep_probe.py):

- audio tower: B=16, N=593 (112x1036 mel grid), ragged final lane tile
- video temporal path: packed [128-token, block_diag=8] sequences at
  B=257 rows (16 videos x 257 positions / 16 instances-per-row)

Same honest timing: 24-layer-equivalent chain inside one jitted
fori_loop, min of 3 rounds.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.kernels.flash_attention import fused_attention

H, HD = 16, 64
D = H * HD
LAYERS = 24
ITERS = 20


def time_config(q, k, v, group, bb, block_diag, rounds=3):
    def body(i, q):
        out = q
        for _ in range(LAYERS):
            out = fused_attention(out, k, v, H, group=group, batch_block=bb,
                                  block_diag=block_diag)
        return out

    @jax.jit
    def run(q):
        return jax.lax.fori_loop(0, ITERS, body, q)

    out = run(q)
    float(jnp.asarray(out, jnp.float32).ravel()[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = run(q)
        float(jnp.asarray(out, jnp.float32).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    return best


def sweep(name, B, N, block_diag, configs):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, D)) * 0.02, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    for g, bb in configs:
        try:
            ms = time_config(q, k, v, g, bb, block_diag)
            print(f"{name} group={g:2d} bb={bb:2d}: {ms:7.2f} ms / "
                  f"{LAYERS} layers ({ms / LAYERS * 1000:6.1f} us/layer)",
                  flush=True)
        except Exception as e:
            print(f"{name} group={g:2d} bb={bb:2d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)


def main():
    enable_compilation_cache()
    # audio: default auto-selects group=4 (VMEM budget at N=593), bb=1
    sweep("audio N=593 B=16", 16, 593, 0,
          [(4, 1), (4, 2), (4, 4), (2, 1), (2, 4), (2, 8)])
    # temporal packed: 16 videos x 257 positions -> 257 rows of 128 tokens
    # (B=257 is prime, so batch_block = gcd(B, bb) is always 1 here)
    sweep("temporal N=128 B=257 bd=8", 257, 128, 8,
          [(16, 1), (8, 1), (4, 1), (2, 1)])


if __name__ == "__main__":
    main()
