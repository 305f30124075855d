"""A/B the fused Pallas MLP-backward dx kernel vs the XLA chain
(round-5 spike, VERDICT r4 #3 — go/no-go with a measured receipt).

Shapes: the b64 image-train backward family — M = 64*257 = 16448 tokens,
D=1024, FF=4096, bf16, 24 chained layers (one iteration = the full
stack's MLP-dx work), bench methodology (in-jit fori_loop, loss-chained,
min-of-3).

  parity  numeric check vs the autodiff chain at the production shapes
  ab      fused kernel vs hand-rolled XLA chain vs jax.vjp autodiff
  sweep   (bm, bf) grid sweep of the fused kernel

Run: python scripts/mlp_bwd_probe.py [parity|ab|sweep|all] [bm bf]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.kernels.mlp_bwd import mlp_bwd_dx, mlp_bwd_dx_xla
from missm_tpu.ops.basic import quick_gelu

M, D, FF, L = 64 * 257, 1024, 4096, 24
ITERS = 10


def make_data(seed=0, layers=L):
    rng = np.random.default_rng(seed)
    dy = jnp.asarray(rng.standard_normal((M, D)), jnp.bfloat16)
    wide = jnp.asarray(rng.standard_normal((layers, M, FF)) * 0.5,
                       jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((layers, D, FF)) * 0.02,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((layers, FF, D)) * 0.02,
                     jnp.bfloat16)
    return dy, wide, w1, w2


def vjp_dx(dy, wide, w1, w2):
    """The true autodiff chain: vjp of act(wide) @ w2 wrt wide's
    producer is not expressible standalone, so differentiate the
    h -> quick_gelu(h @ w1) @ w2 MLP wrt h with the SAME saved wide —
    autodiff recomputes wide from h, mirroring what the remat policy
    avoids; to isolate the dx chain itself, differentiate
    w -> quick_gelu(w) @ w2 and chain the fc1 dx matmul explicitly."""
    def f(w):
        return quick_gelu(w) @ w2
    _, pull = jax.vjp(f, wide)
    (dwide,) = pull(dy)
    return jax.lax.dot_general(
        dwide, w1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dy.dtype)


def bench_chain(fn, tag, layers=L, **kw):
    dy, wide, w1, w2 = make_data(layers=layers)

    @jax.jit
    def loop(dy, wide, w1, w2):
        def iteration(i, carry):
            def layer(l, h):
                return fn(h, wide[l], w1[l], w2[l], **kw)
            h = jax.lax.fori_loop(0, layers, layer, carry)
            return carry + 1e-20 * h
        out = jax.lax.fori_loop(0, ITERS, iteration, dy)
        return jnp.sum(out.astype(jnp.float32))

    float(loop(dy, wide, w1, w2))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(dy, wide, w1, w2))
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    tf = 4e-12 * M * D * FF * layers / best
    print(f"{tag}: {best * 1e3:7.2f} ms/stack ({tf:6.1f} TFLOP/s)",
          flush=True)
    return best


def parity():
    dy, wide, w1, w2 = make_data(layers=1)
    ref = np.asarray(mlp_bwd_dx_xla(dy, wide[0], w1[0], w2[0]),
                     np.float32)
    got = np.asarray(mlp_bwd_dx(dy, wide[0], w1[0], w2[0]), np.float32)
    vj = np.asarray(vjp_dx(dy, wide[0], w1[0], w2[0]), np.float32)
    scale = np.abs(ref).max()
    print(f"parity: max|fused-xla|={np.abs(got - ref).max():.4f} "
          f"max|vjp-xla|={np.abs(vj - ref).max():.4f} "
          f"(scale {scale:.1f})", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    enable_compilation_cache()
    if which in ("parity", "all"):
        parity()
    if which in ("ab", "all"):
        # xla hand chain first (its jaxpr is what autodiff emits for this
        # chain — vjp_dx available separately via `vjp` mode; skipped by
        # default to save a tunnel compile, ~10-30 min each this session)
        bench_chain(mlp_bwd_dx_xla, "xla hand chain    ")
        bench_chain(mlp_bwd_dx, "pallas fused      ")
    if which == "vjp":
        bench_chain(vjp_dx, "vjp-autodiff dx chain")
    if which == "sweep":
        for bm in (256, 512, 1024):
            for bf in (512, 1024, 2048):
                try:
                    bench_chain(mlp_bwd_dx, f"pallas bm={bm:4d} bf={bf:4d}",
                                bm=bm, bf=bf)
                except Exception as e:
                    print(f"pallas bm={bm} bf={bf}: FAILED "
                          f"{type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
