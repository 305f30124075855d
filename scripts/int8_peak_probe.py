"""Is the v5e's int8 MXU path worth an int8 inference mode?

The v5e datasheet rates int8 at 394 TOPS — 2x the bf16 197 TFLOP/s. If
that ratio survives through XLA (`lax.dot_general` on int8 operands with
preferred_element_type=int32), a quantized eval path roughly doubles the
matmul-bound eval throughput and is worth building; if XLA lowers int8
dots to the bf16 pipeline (or pays conversion passes), it is not.

Methodology matches matmul_peak_probe.py (in-jit fori_loop, tunnel RTT
amortized) with one twist: both dtypes use the IDENTICAL consumption
scheme (scalar c.sum() chained into the next iteration's `a`) so the
epilogue cost cancels in the comparison. The sum forces the full product;
the chained scalar add keeps iterations serialized.

Run: python scripts/int8_peak_probe.py [n iters]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(jax, jnp, np, n: int, iters: int, kind: str):
    rng = np.random.default_rng(0)
    if kind == "int8":
        a = jnp.asarray(rng.integers(-100, 100, (n, n)), jnp.int8)
        b = jnp.asarray(rng.integers(-100, 100, (n, n)), jnp.int8)
        acc_t = jnp.int32
    else:
        a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
        acc_t = jnp.float32

    dn = (((1,), (0,)), ((), ()))

    @jax.jit
    def loop(a, b):
        def body(i, carry):
            a, acc = carry
            c = jax.lax.dot_general(a, b, dn, preferred_element_type=acc_t)
            s = c.sum()
            a = a + (s % 3 if kind == "int8"
                     else s * acc_t(1e-30)).astype(a.dtype)
            return (a, acc + s.astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, iters, body, (a, jnp.float32(0)))
        return acc

    float(loop(a, b))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(a, b))
        best = min(best, time.perf_counter() - t0)
    out = {"kind": kind, "shape": [n, n, n], "iters": iters,
           "ms_per_matmul": round(best / iters * 1e3, 3),
           "tops": round(2 * n ** 3 * iters / best / 1e12, 1)}
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from missm_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    r_bf = probe(jax, jnp, np, n, iters, "bf16")
    r_i8 = probe(jax, jnp, np, n, iters, "int8")
    print(json.dumps({
        "int8_over_bf16": round(r_i8["tops"] / r_bf["tops"], 2),
        "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
