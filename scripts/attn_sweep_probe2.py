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


def time_bwd(q, k, v, group, block_diag, rounds=3):
    from missm_tpu.kernels.flash_attention import fused_attention_bwd

    @jax.jit
    def run(q, k, v, g0):
        def body(i, g):
            out = g
            for _ in range(LAYERS):
                dq, dk, dv = fused_attention_bwd(q, k, v, out, H,
                                                 block_diag=block_diag,
                                                 group=group)
                out = dq
            return out
        return jax.lax.fori_loop(0, ITERS, body, g0)

    g0 = q * 0.01
    out = run(q, k, v, g0)
    float(jnp.asarray(out, jnp.float32).ravel()[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = run(q, k, v, g0)
        float(jnp.asarray(out, jnp.float32).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    return best


def sweep_bwd(name, B, N, block_diag, groups):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, D)) * 0.02, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    for g in groups:
        try:
            ms = time_bwd(q, k, v, g, block_diag)
            print(f"{name} BWD group={g:2d}: {ms:7.2f} ms / {LAYERS} "
                  f"layers ({ms / LAYERS * 1000:6.1f} us/layer)",
                  flush=True)
        except Exception as e:
            print(f"{name} BWD group={g:2d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


def main():
    enable_compilation_cache()
    only_bwd = "bwd" in sys.argv[1:]
    if not only_bwd:
        # audio: default auto-selects group=4 (VMEM budget at N=593), bb=1
        sweep("audio N=593 B=16", 16, 593, 0,
              [(4, 1), (4, 2), (4, 4), (2, 1), (2, 4), (2, 8)])
        # temporal packed: 16 videos x 257 positions -> 257 rows of 128
        # tokens (B=257 prime, so batch_block = gcd(B, bb) is always 1)
        sweep("temporal N=128 B=257 bd=8", 257, 128, 8,
              [(16, 1), (8, 1), (4, 1), (2, 1)])
    # round 4: the BACKWARD grid was never swept at these shapes — the
    # auto cap picks group 8 for the temporal block-diag bwd, but the
    # forward at this shape was monotonically better at 16 (small
    # block-diag scores amortize without VMEM pressure). Video-train
    # shape: B=8 videos x 257 positions = 2056 rows -> 2056/16. Use the
    # train3 shape (128 packed instances...) = B rows of packed seqs.
    sweep_bwd("temporal N=128 bd=8 B=257", 257, 128, 8, (16, 8, 4, 2))
    sweep_bwd("audio N=593 B=16", 16, 593, 0, (2,))


if __name__ == "__main__":
    main()
