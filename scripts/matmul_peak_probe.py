"""Pin the attached chip's real sustained bf16 matmul peak (VERDICT r2
weak #2 / next #3): the repo's MFU statements were anchored to an ASSUMED
197 TFLOP/s v5e peak, while the measured attention-identity ablation floor
implied ~203 TFLOP/s — one of the two had to be wrong. This probe measures
sustained TFLOP/s for pure bf16 matmuls at several large shapes with the
same in-jit fori_loop methodology as bench.py (one dispatch, one readback,
loss-chained iterations so XLA cannot elide or overlap-collapse steps).

Run: python scripts/matmul_peak_probe.py   (on the TPU; ~1 min)
Output: one JSON line per shape + a summary line with the max.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from missm_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    shapes = [
        (4096, 4096, 4096),
        (8192, 8192, 8192),
        (16384, 8192, 8192),
        (16448, 1024, 1024),   # the ViT-L projection shape (64*257 tokens)
        (16448, 4096, 1024),   # the ViT-L MLP shape
    ]
    iters = 50
    results = []
    for (M, K, N) in shapes:
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

        @jax.jit
        def loop(a, b):
            def body(i, carry):
                a, acc = carry
                c = jnp.dot(a, b, preferred_element_type=jnp.float32)
                acc = acc + c[0, 0]
                # chain: next iteration's A depends on this C (rank-0 tap,
                # no extra matmul work)
                a = a + (c[0, 0] * 0).astype(a.dtype)
                return (a, acc)
            _, acc = jax.lax.fori_loop(0, iters, body, (a, jnp.float32(0)))
            return acc

        float(loop(a, b))  # compile + warm
        t0 = time.perf_counter()
        float(loop(a, b))
        dt = time.perf_counter() - t0
        tflops = 2 * M * K * N * iters / dt / 1e12
        results.append({"shape": [M, K, N], "ms_per_matmul": dt / iters * 1e3,
                        "tflops": round(tflops, 1)})
        print(json.dumps(results[-1]), flush=True)

    peak = max(r["tflops"] for r in results)
    print(json.dumps({"sustained_peak_tflops_bf16": peak,
                      "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
