"""Ablation probe: where does the ViT-L step time go?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.config import languagebind_large
from missm_tpu.models.tower import init_vision_params
from missm_tpu.ops.basic import get_activation, layer_norm, linear
from missm_tpu.kernels.flash_attention import fused_attention

B = 64
cfg = languagebind_large("image").vision
N = cfg.num_patches + 1
D = cfg.hidden_size
H = cfg.num_heads


def timeit(f, *args, iters=10):
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def make_tower(attn_mode, group=4, qkv_fused=False, batch_block=1):
    act = get_activation(cfg.hidden_act)

    def block(p, x):
        h = layer_norm(p["ln1"], x, 1e-5)
        if qkv_fused:
            wqkv = jnp.concatenate([p["attn"]["q"]["w"], p["attn"]["k"]["w"],
                                    p["attn"]["v"]["w"]], axis=1)
            bqkv = jnp.concatenate([p["attn"]["q"]["b"], p["attn"]["k"]["b"],
                                    p["attn"]["v"]["b"]])
            qkv = (jnp.dot(h, wqkv, preferred_element_type=jnp.float32)
                   + bqkv).astype(h.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = linear(p["attn"]["q"], h)
            k = linear(p["attn"]["k"], h)
            v = linear(p["attn"]["v"], h)
        if attn_mode == "fused":
            a = fused_attention(q, k, v, H, group=group,
                                batch_block=batch_block)
        elif attn_mode == "identity":
            a = v
        else:  # einsum
            hd = D // H
            qh = q.reshape(B, N, H, hd)
            kh = k.reshape(B, N, H, hd)
            vh = v.reshape(B, N, H, hd)
            s = jnp.einsum("bqhd,bkhd->bhqk", qh * (hd ** -0.5), kh,
                           preferred_element_type=jnp.float32)
            pr = jax.nn.softmax(s.astype(jnp.float32), -1).astype(h.dtype)
            a = jnp.einsum("bhqk,bkhd->bqhd", pr, vh,
                           preferred_element_type=jnp.float32).astype(
                               h.dtype).reshape(B, N, D)
        x = x + linear(p["attn"]["out"], a)
        h = layer_norm(p["ln2"], x, 1e-5)
        x = x + linear(p["mlp"]["fc2"], act(linear(p["mlp"]["fc1"], h)))
        return x

    @jax.jit
    def run(params, x):
        def body(h, p):
            return block(p, h), None
        h, _ = jax.lax.scan(body, x, params["blocks"])
        return h

    return run


def make_tower_bhne(group=1):
    """Projections emit head-major [B, H, N, hd] directly (transpose fused
    into the matmul); kernel blocks are contiguous, no lane slicing."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = get_activation(cfg.hidden_act)
    hd = D // H

    def attn_kernel(q_ref, k_ref, v_ref, o_ref):
        for g in range(group):
            q = q_ref[0, g]
            k = k_ref[0, g]
            v = v_ref[0, g]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (hd ** -0.5)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(q.dtype)
            o = jax.lax.dot_general(
                p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, g] = o.astype(o_ref.dtype)

    def fused_bhne(q, k, v):
        spec = pl.BlockSpec((1, group, N, hd), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            attn_kernel, grid=(B, H // group),
            in_specs=[spec, spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, H, N, hd), q.dtype),
        )(q, k, v)

    def block(p, x):
        h = layer_norm(p["ln1"], x, 1e-5)
        wq = p["attn"]["q"]["w"].reshape(D, H, hd)
        wk = p["attn"]["k"]["w"].reshape(D, H, hd)
        wv = p["attn"]["v"]["w"].reshape(D, H, hd)
        q = (jnp.einsum("bnd,dhe->bhne", h, wq,
                        preferred_element_type=jnp.float32)
             + p["attn"]["q"]["b"].reshape(H, 1, hd)).astype(h.dtype)
        k = (jnp.einsum("bnd,dhe->bhne", h, wk,
                        preferred_element_type=jnp.float32)
             + p["attn"]["k"]["b"].reshape(H, 1, hd)).astype(h.dtype)
        v = (jnp.einsum("bnd,dhe->bhne", h, wv,
                        preferred_element_type=jnp.float32)
             + p["attn"]["v"]["b"].reshape(H, 1, hd)).astype(h.dtype)
        a = fused_bhne(q, k, v)
        wo = p["attn"]["out"]["w"].reshape(H, hd, D)
        o = (jnp.einsum("bhne,hed->bnd", a, wo,
                        preferred_element_type=jnp.float32)
             + p["attn"]["out"]["b"]).astype(h.dtype)
        x = x + o
        h = layer_norm(p["ln2"], x, 1e-5)
        x = x + linear(p["mlp"]["fc2"], act(linear(p["mlp"]["fc1"], h)))
        return x

    @jax.jit
    def run(params, x):
        def body(h, p):
            return block(p, h), None
        h, _ = jax.lax.scan(body, x, params["blocks"])
        return h

    return run


def make_tower_scratch():
    """Stage head slices into a [H, N, hd] VMEM scratch, then one batched
    dot + one softmax + one batched dot for all heads."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = get_activation(cfg.hidden_act)
    hd = D // H

    def attn_kernel(q_ref, k_ref, v_ref, o_ref, qs, ks, vs):
        for g in range(H):
            sl = slice(g * hd, (g + 1) * hd)
            qs[g] = q_ref[0, :, sl]
            ks[g] = k_ref[0, :, sl]
            vs[g] = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            qs[...], ks[...], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (hd ** -0.5)
        m = jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=2, keepdims=True)).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            p, vs[...], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        for g in range(H):
            sl = slice(g * hd, (g + 1) * hd)
            o_ref[0, :, sl] = o[g].astype(o_ref.dtype)

    def fused(q, k, v):
        spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            attn_kernel, grid=(B,),
            in_specs=[spec, spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
            scratch_shapes=[pltpu.VMEM((H, N, hd), jnp.bfloat16)] * 3,
        )(q, k, v)

    def block(p, x):
        h = layer_norm(p["ln1"], x, 1e-5)
        q = linear(p["attn"]["q"], h)
        k = linear(p["attn"]["k"], h)
        v = linear(p["attn"]["v"], h)
        x = x + linear(p["attn"]["out"], fused(q, k, v))
        h = layer_norm(p["ln2"], x, 1e-5)
        x = x + linear(p["mlp"]["fc2"], act(linear(p["mlp"]["fc1"], h)))
        return x

    @jax.jit
    def run(params, x):
        def body(h, p):
            return block(p, h), None
        h, _ = jax.lax.scan(body, x, params["blocks"])
        return h

    return run


def make_tower_packed_debug(mode):
    """Packed-pair kernel with pieces knocked out, to locate the ~21 ms
    overhead over the matmul floor: 'full' == production; 'noexp' replaces
    exp with identity (isolates transcendental cost); 'dotsonly' skips
    softmax entirely (isolates reductions+exp together); 'nostage' slices
    q/k/v directly in the dot operands instead of scratch staging."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = get_activation(cfg.hidden_act)
    hd = D // H
    pairs = H // 2
    pw = 2 * hd
    scale = hd ** -0.5

    def attn_kernel(q_ref, k_ref, v_ref, o_ref, qs, ks, vs):
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, pw), 1)
        lo = (lane < hd)[None]

        if mode == "nostage":
            # per-pair dots straight off the input block — no scratch copies
            zero = jnp.zeros((), q_ref.dtype)
            lo2 = lane < hd
            for p in range(pairs):
                sl = slice(p * pw, (p + 1) * pw)
                qb, kb, vb = q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl]
                o = None
                for mask in (lo2, ~lo2):
                    s = jax.lax.dot_general(
                        jnp.where(mask, qb, zero), kb,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    m = jnp.max(s, axis=1, keepdims=True)
                    e_f = jnp.exp(s - m)
                    den = jnp.sum(e_f, axis=1, keepdims=True)
                    oh = jax.lax.dot_general(
                        e_f.astype(qb.dtype), jnp.where(mask, vb, zero),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) / den
                    o = oh if o is None else o + oh
                o_ref[0, :, sl] = o.astype(o_ref.dtype)
            return

        for p in range(pairs):
            sl = slice(p * pw, (p + 1) * pw)
            qs[p] = q_ref[0, :, sl]
            ks[p] = k_ref[0, :, sl]
            vs[p] = v_ref[0, :, sl]
        q_all, k_all, v_all = qs[...], ks[...], vs[...]
        zero = jnp.zeros((), q_all.dtype)
        dn_qk = (((2,), (2,)), ((0,), (0,)))
        dn_av = (((2,), (1,)), ((0,), (0,)))
        o = None
        for mask in (lo, ~lo):
            s = jax.lax.dot_general(
                jnp.where(mask, q_all, zero), k_all, dn_qk,
                preferred_element_type=jnp.float32) * scale
            if mode == "dotsonly":
                e = s.astype(q_all.dtype)
                den = 1.0
            elif mode == "noexp":
                m = jnp.max(s, axis=2, keepdims=True)
                e_f = s - m
                den = jnp.sum(e_f, axis=2, keepdims=True)
                e = e_f.astype(q_all.dtype)
            else:
                m = jnp.max(s, axis=2, keepdims=True)
                e_f = jnp.exp(s - m)
                den = jnp.sum(e_f, axis=2, keepdims=True)
                e = e_f.astype(q_all.dtype)
            oh = jax.lax.dot_general(
                e, jnp.where(mask, v_all, zero), dn_av,
                preferred_element_type=jnp.float32) / den
            o = oh if o is None else o + oh
        for p in range(pairs):
            sl = slice(p * pw, (p + 1) * pw)
            o_ref[0, :, sl] = o[p].astype(o_ref.dtype)

    def fused(q, k, v):
        spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            attn_kernel, grid=(B,),
            in_specs=[spec, spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
            scratch_shapes=[pltpu.VMEM((pairs, N, pw), jnp.bfloat16)] * 3,
        )(q, k, v)

    def block(p, x):
        h = layer_norm(p["ln1"], x, 1e-5)
        q = linear(p["attn"]["q"], h)
        k = linear(p["attn"]["k"], h)
        v = linear(p["attn"]["v"], h)
        x = x + linear(p["attn"]["out"], fused(q, k, v))
        h = layer_norm(p["ln2"], x, 1e-5)
        x = x + linear(p["mlp"]["fc2"], act(linear(p["mlp"]["fc1"], h)))
        return x

    @jax.jit
    def run(params, x):
        def body(h, p):
            return block(p, h), None
        h, _ = jax.lax.scan(body, x, params["blocks"])
        return h

    return run


def main():
    params = init_vision_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, N, D)),
                    dtype=jnp.bfloat16)
    # Measured 2026-08-16 (v5e, b64): identity 50.8 / dotsonly 68.2 /
    # noexp 71.1 / full 71.6 / nostage 71.6 / unpacked scratch g=16 73.2 —
    # overhead is the score dots' N=257->384 lane-tile padding + DMA, not
    # softmax (exp = 0.5 ms); staging copies are free once lane-aligned.
    for name, fn in [
        ("identity", make_tower("identity")),
        ("fused g=16 (production, packed pairs)", make_tower("fused", 16)),
        ("packed dotsonly", make_tower_packed_debug("dotsonly")),
        ("packed noexp", make_tower_packed_debug("noexp")),
        ("packed nostage", make_tower_packed_debug("nostage")),
        ("scratch-batched (round-1 kernel)", make_tower_scratch()),
    ]:
        dt = timeit(fn, params, x)
        print(f"{name}: {dt * 1000:.1f} ms ({B / dt:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
