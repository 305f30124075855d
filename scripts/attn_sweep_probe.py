"""Sweep (head group, batch_block) for the CLS-split forward kernel at
flagship eval shapes (B=64, N=257, H=16, hd=64, bf16) with honest in-jit
timing: each config runs a 24-layer-equivalent chain of kernel calls
inside ONE jitted fori_loop (one dispatch, one scalar readback), so the
~25 ms tunnel RTT and dispatch overheads cancel out of the comparison.

Context (docs/PERF.md): the eval vision stack measures ~20 ms/step above
its 49.3 ms matmul floor; the ablation attributes ~17.4 ms of that to the
attention kernels' score dots + staging + DMA, where the pair-packed MXU
floor is ~8.3 ms (2x masked-dot packing is structural at hd=64) — i.e.
~9 ms of staging/grid/DMA overhead is potentially schedulable away.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.kernels.flash_attention import (fused_attention_cls,
                                               fused_attention_cls_bwd)

# MISSM_SWEEP_B overrides the batch: the round-4 bench train config runs
# 16-instance microbatches (4x16 accum), a shape the original B=64 sweep
# never covered.
B = int(os.environ.get("MISSM_SWEEP_B", "64"))
N, H, HD = 257, 16, 64
D = H * HD
LAYERS = 24
ITERS = 20


def time_config(q, kc, km, vc, vm, group, bb, rounds=3):
    def body(i, q):
        out = q
        for _ in range(LAYERS):
            out = fused_attention_cls(out, kc, km, vc, vm, H,
                                      group=group, batch_block=bb)
        # chain: next iteration's q depends on this one's output
        return out

    @jax.jit
    def run(q):
        return jax.lax.fori_loop(0, ITERS, body, q)

    out = run(q)
    float(jnp.asarray(out, jnp.float32).ravel()[0])  # warm + sync
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = run(q)
        float(jnp.asarray(out, jnp.float32).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    return best  # ms per 24-layer pass


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, D)) * 0.02, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    kc, km = k[:, :1], k[:, 1:]
    vc, vm = v[:, :1], v[:, 1:]

    import itertools
    configs = [(g, bb) for g, bb in itertools.product((16, 8, 4, 2),
                                                      (1, 2, 4, 8, 16))
               ] if "--full" in sys.argv else [
               (16, 1), (4, 4), (4, 8), (4, 16), (2, 4), (2, 8), (2, 16)]
    for g, bb in configs:
        try:
            ms = time_config(q, kc, km, vc, vm, g, bb)
            print(f"fwd group={g:2d} bb={bb:2d}: {ms:7.2f} ms / {LAYERS} "
                  f"layers ({ms / LAYERS * 1000:6.1f} us/layer)", flush=True)
        except Exception as e:
            print(f"fwd group={g:2d} bb={bb:2d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    # backward kernel: (group, batch_block) sweep — bb was fixed at 1
    # until round 4 (the fwd retune's amortization lever, now plumbed
    # through fused_attention_cls_bwd)
    dg = jnp.asarray(rng.standard_normal((B, N, D)) * 0.02, jnp.bfloat16)

    def time_bwd(group, bb, rounds=3):
        @jax.jit
        def run(q, kc, km, vc, vm, dgc):
            def body(i, out):
                for _ in range(LAYERS):
                    grads = fused_attention_cls_bwd(
                        q, kc, km, vc, vm, out, H, group=group,
                        batch_block=bb)
                    out = grads[0]  # chain through dq
                return out
            return jax.lax.fori_loop(0, ITERS, body, dgc)

        out = run(q, kc, km, vc, vm, dg)
        float(jnp.asarray(out, jnp.float32).ravel()[0])
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = run(q, kc, km, vc, vm, dg)
            float(jnp.asarray(out, jnp.float32).ravel()[0])
            best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
        return best

    import itertools
    bwd_cfgs = [(g_, bb_) for g_, bb_ in itertools.product(
        (8, 4, 2), (1, 2, 4, 8, 16))]
    for g_, bb_ in bwd_cfgs:
        try:
            ms = time_bwd(g_, bb_)
            print(f"bwd group={g_:2d} bb={bb_:2d}: {ms:7.2f} ms / {LAYERS} "
                  f"layers ({ms / LAYERS * 1000:6.1f} us/layer)", flush=True)
        except Exception as e:
            print(f"bwd group={g_:2d} bb={bb_:2d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
