"""Pin the attached chip's real sustained bf16 matmul peak (VERDICT r2
weak #2 / next #3): the repo's MFU statements were anchored to an ASSUMED
197 TFLOP/s v5e peak, while the measured attention-identity ablation floor
implied ~203 TFLOP/s — one of the two had to be wrong.

Methodology (the first attempt got this wrong in two ways, kept here as a
warning):
- Iteration counts must amortize the ~25 ms tunnel dispatch+readback RTT:
  20 iters of a 0.7 ms matmul measures the tunnel, not the MXU (55-67
  "TFLOP/s" artifacts).
- The per-iteration consumer must touch ALL of C (or XLA legally shrinks
  the matmul: a `c[0,0]` tap reduces it to one row x column) but stay
  cheap: `a += c * bf16(1e-30)` chains iterations, forces the full
  product, rounds to a no-op in bf16, and fuses into the matmul epilogue.
- bf16 output (no preferred_element_type) halves the C write traffic;
  MXU accumulation is f32 internally regardless.

Measured 2026-08-17 (this chip, bf16):
  4096^3  x1000 : 0.758 ms  -> 181.3 TFLOP/s
  8192^3  x 200 : 6.92  ms  -> 158.8 TFLOP/s
  16384^3 x  60 : 51.3  ms  -> 171.4 TFLOP/s
Sustained peak ~= 181 TFLOP/s (92% of the 197 v5e datasheet number) —
the anchor for every MFU statement in docs/PERF.md.

Run: python scripts/matmul_peak_probe.py [n iters]...
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(jax, jnp, np, n: int, iters: int):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    @jax.jit
    def loop(a, b):
        def body(i, carry):
            a, acc = carry
            c = jnp.dot(a, b)                     # bf16 out
            a = a + c * jnp.bfloat16(1e-30)       # consume ALL of c
            acc = acc + c[0, 0].astype(jnp.float32)
            return (a, acc)
        _, acc = jax.lax.fori_loop(0, iters, body, (a, jnp.float32(0)))
        return acc

    float(loop(a, b))  # compile + warm
    t0 = time.perf_counter()
    float(loop(a, b))
    dt = time.perf_counter() - t0
    out = {"shape": [n, n, n], "iters": iters,
           "ms_per_matmul": round(dt / iters * 1e3, 3),
           "tflops": round(2 * n ** 3 * iters / dt / 1e12, 1)}
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from missm_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    shapes = [(4096, 1000), (8192, 200), (16384, 60)]
    if len(sys.argv) > 2:
        shapes = [(int(sys.argv[1]), int(sys.argv[2]))]
    results = [probe(jax, jnp, np, n, it) for n, it in shapes]
    peak = max(r["tflops"] for r in results)
    print(json.dumps({"sustained_peak_tflops_bf16": peak,
                      "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
