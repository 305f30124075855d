"""Is the backward's dx chain paying an NT-matmul penalty?

scripts/bwd_pieces_probe.py (r4) measured the pure input-gradient chain
of the identity stack at 67.25 ms vs the 49.3 ms forward floor — the
same FLOPs, 1.36x slower. The dx matmuls contract the OUTPUT dim of W
(dy @ W^T, an "NT" gemm); the forward contracts the input dim ("NN").
This isolates that: chains of the three formulations at the exact
backward shapes, in-jit, min-of-3.

  nn      y = x @ W                 (forward reference)
  nt      y = dot(x, W, contract W's dim 1)   (what autodiff emits)
  nt_pre  y = x @ Wt (pre-transposed copy held in HBM)

If nt_pre ~= nn < nt, storing transposed frozen-weight copies for the
backward is worth its memory. If nn ~= nt, the bwd_pieces gap is
scheduling, not operand orientation.

Run: python scripts/nt_matmul_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache

M, D, FF, L = 16448, 1024, 4096, 24
ITERS = 10


def timed(tag, loop, *args):
    jloop = jax.jit(loop)
    float(jnp.asarray(jloop(*args), jnp.float32))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(jloop(*args), jnp.float32))
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    flops = ITERS and (L * (4 * 2 * M * D * D + 2 * 2 * M * D * FF))
    print(f"{tag:8s}: {best * 1e3:7.2f} ms  "
          f"({flops / best / 1e12 / ITERS * ITERS:.1f} TF/s)", flush=True)
    return best


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((M, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((L, D, D)) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((L, D, FF)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((L, FF, D)) * 0.02, jnp.bfloat16)
    # pre-transposed copies (what a stored-Wt backward would read)
    wT = jnp.swapaxes(w, 1, 2)
    w1T = jnp.swapaxes(w1, 1, 2)
    w2T = jnp.swapaxes(w2, 1, 2)

    def dot_nn(x, a):
        return jnp.dot(x, a, preferred_element_type=jnp.float32).astype(
            x.dtype)

    def dot_nt(x, a):
        # contract a's LAST dim — dy @ W^T as autodiff writes it
        return jax.lax.dot_general(
            x, a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def chain(dot):
        # ws passed as ARGUMENTS: closing over the 450 MB weight stack
        # embeds it as jit constants, which the remote compile service
        # rejects (HTTP 413) — the documented params-as-constants pitfall
        def body_of(wq, wa, wb):
            def body(h, i):
                for _ in range(4):
                    h = dot(h, wq[i])
                hw = dot(h, wa[i])
                h = dot(hw, wb[i])
                return h, None
            return body

        def loop(ws, x):
            def it(j, c):
                h, _ = jax.lax.scan(body_of(*ws), c * (1.0 + 0.0 * j),
                                    jnp.arange(L))
                return c + 1e-20 * h.astype(c.dtype)
            return jnp.sum(jax.lax.fori_loop(0, ITERS, it, x)
                           .astype(jnp.float32))
        return loop

    timed("nn", chain(dot_nn), (w, w1, w2), x0)
    # NT at the actual backward orientation: contract the OUT dim of the
    # stored (in, out) weights; shapes stay [M, D] -> use w (square),
    # w2 (FF out->in means dy[M,D] @ w2^T -> [M,FF]) etc. For the chain
    # to compose, run the same square/wide/narrow sequence with NT dots:
    timed("nt", chain(dot_nt), (w, w2, w1), x0)
    timed("nt_pre", chain(dot_nn), (wT, w2T, w1T), x0)


if __name__ == "__main__":
    main()
