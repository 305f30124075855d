"""Micro-bench: attention formulations at ViT-L shapes on the real chip."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH, N, D = 64 * 16, 257, 64


def timeit(f, *args, iters=20):
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


@jax.jit
def einsum_attn(q, k, v):
    s = jnp.einsum("bqd,bkd->bqk", q * (D ** -0.5), k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@jax.jit
def einsum_attn_bf16sm(q, k, v):
    s = jnp.einsum("bqd,bkd->bqk", q * (D ** -0.5), k,
                   preferred_element_type=jnp.bfloat16)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v,
                      preferred_element_type=jnp.bfloat16)


def make_fused(group):
    n_pad = ((N + 7) // 8) * 8

    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[...]
        k = k_ref[...]
        v = v_ref[...]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (D ** -0.5)
        ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(ids < N, s, jnp.finfo(jnp.float32).min)
        m = jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=2, keepdims=True)).astype(q.dtype)
        o = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[...] = o.astype(o_ref.dtype)

    @jax.jit
    def run(q, k, v):
        pad = [(0, 0), (0, n_pad - N), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        out = pl.pallas_call(
            kernel,
            grid=(BH // group,),
            in_specs=[pl.BlockSpec((group, n_pad, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((group, n_pad, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BH, n_pad, D), q.dtype),
        )(q, k, v)
        return out[:, :N, :]

    return run


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((BH, N, D)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BH, N, D)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BH, N, D)), dtype=jnp.bfloat16)

    print("einsum f32 softmax:", timeit(einsum_attn, q, k, v) * 1e3, "ms",
          flush=True)
    print("einsum bf16 logits:", timeit(einsum_attn_bf16sm, q, k, v) * 1e3,
          "ms", flush=True)
    for g in (1, 4, 8, 16):
        f = make_fused(g)
        print(f"pallas group={g}:", timeit(f, q, k, v) * 1e3, "ms",
              flush=True)


if __name__ == "__main__":
    main()
