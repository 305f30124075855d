"""Backward-side piece accounting at the b64 image-train shapes.

The round-4 knockout gives tower bwd = grads(237.2) - fwd(69.4) =
167.8 ms under save_attn_mlp_qkv. The *accounted* pieces (dx matmul
floor ~49, bwd attention kernel ~24, fwd-kernel LoRA replay ~10, LN/gelu
~25, LoRA skinny dots) sum well short of that — this probe times each
family in isolation with the bench methodology (in-jit fori_loop,
loss-chained, params as args) so the residual is located instead of
argued:

  dx_floor   grad wrt INPUT of the identity-attention stack (matmul dx
             + frozen-dW dead-coded — the structural floor)
  dxw_floor  same but differentiating wrt the weights too (what the
             backward would cost if dW were NOT dead-coded)
  ln_bwd     48 chained LayerNorms fwd+bwd (the ln1/ln2 VPU family)
  gelu_bwd   24 chained quick_gelu at [M, 4096] fwd+bwd
  attn_pair  24x cls-split fused attention fwd+bwd (kernel VJP)
  lora_dots  96x the exact-rank LoRA gradient dots (skinny [.,2] dots)
  prod       value_and_grad of the production 24-block stack wrt the
             LoRA+fusion-trainable partition (the real tower bwd)

Run: python scripts/bwd_pieces_probe.py [piece ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.core.config import languagebind_large
from missm_tpu.models.tower import _block_forward, init_vision_params
from missm_tpu.ops.basic import get_activation, layer_norm, quick_gelu

B = 64
ITERS = 10
cfg = languagebind_large("image").vision
N = cfg.num_patches + 1
D = cfg.hidden_size
H = cfg.num_heads
FF = cfg.intermediate_size
L = cfg.num_layers
SCALING = cfg.lora_alpha / cfg.lora_r if cfg.lora_r else None
ACT = get_activation(cfg.hidden_act)


def timed(tag, make_loop, *args):
    loop = jax.jit(make_loop)
    float(jnp.asarray(loop(*args), jnp.float32))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(loop(*args), jnp.float32))
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"{tag:10s}: {best * 1e3:7.2f} ms", flush=True)
    return best


def rot(x, i):
    # loss-chain: fold the iteration index in so steps stay honest
    return x * (1.0 + 0.0 * i)


def main():
    which = set(sys.argv[1:]) or {"dx_floor", "dxw_floor", "ln_bwd",
                                  "gelu_bwd", "attn_pair", "lora_dots",
                                  "prod"}
    enable_cache = enable_compilation_cache()  # noqa: F841
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16)
        if t.dtype == jnp.float32 else t, params)
    blocks = params["blocks"]

    if "dx_floor" in which or "dxw_floor" in which:
        wq = blocks["attn"]["q"]["w"]      # [L, D, D]
        w1 = blocks["mlp"]["fc1"]["w"]     # [L, D, FF]
        w2 = blocks["mlp"]["fc2"]["w"]     # [L, FF, D]

        def ident_stack(ws, x):
            wqs, w1s, w2s = ws

            def body(h, i):
                h = jnp.dot(h, wqs[i], preferred_element_type=jnp.float32
                            ).astype(h.dtype)
                h = jnp.dot(h, wqs[i], preferred_element_type=jnp.float32
                            ).astype(h.dtype)
                h = jnp.dot(h, wqs[i], preferred_element_type=jnp.float32
                            ).astype(h.dtype)
                h = jnp.dot(h, wqs[i], preferred_element_type=jnp.float32
                            ).astype(h.dtype)
                w = jnp.dot(h, w1s[i], preferred_element_type=jnp.float32
                            ).astype(h.dtype)
                h = jnp.dot(w, w2s[i], preferred_element_type=jnp.float32
                            ).astype(h.dtype)
                return h, None

            h, _ = jax.lax.scan(body, x, jnp.arange(wqs.shape[0]))
            return jnp.sum(h.astype(jnp.float32))

        if "dx_floor" in which:
            def loop_dx(ws, x):
                def it(i, c):
                    g = jax.grad(ident_stack, argnums=1)(ws, rot(c, i))
                    return c + 1e-20 * g.astype(c.dtype)
                return jnp.sum(jax.lax.fori_loop(0, ITERS, it, x)
                               .astype(jnp.float32))
            timed("dx_floor", loop_dx, (wq, w1, w2), x0)

        if "dxw_floor" in which:
            def loop_dxw(ws, x):
                def it(i, c):
                    gw, g = jax.grad(ident_stack, argnums=(0, 1))(
                        ws, rot(c, i))
                    return (c + 1e-20 * g.astype(c.dtype)
                            + 1e-20 * jnp.sum(gw[0][0, 0, :]).astype(
                                c.dtype))
                return jnp.sum(jax.lax.fori_loop(0, ITERS, it, x)
                               .astype(jnp.float32))
            timed("dxw_floor", loop_dxw, (wq, w1, w2), x0)

    if "ln_bwd" in which:
        lp = {"scale": blocks["ln1"]["scale"][0],
              "bias": blocks["ln1"]["bias"][0]}

        def ln_chain(lp, x):
            def body(h, _):
                h = layer_norm(lp, h, cfg.layer_norm_eps)
                return h, None
            h, _ = jax.lax.scan(body, x, None, length=2 * L)
            return jnp.sum(h.astype(jnp.float32))

        def loop_ln(lp, x):
            def it(i, c):
                g = jax.grad(ln_chain, argnums=1)(lp, rot(c, i))
                return c + 1e-20 * g.astype(c.dtype)
            return jnp.sum(jax.lax.fori_loop(0, ITERS, it, x)
                           .astype(jnp.float32))
        timed("ln_bwd", loop_ln, lp, x0)

    if "gelu_bwd" in which:
        xw = jnp.asarray(rng.standard_normal((B, N, FF)), jnp.bfloat16)

        def gelu_chain(x):
            def body(h, _):
                return quick_gelu(h), None
            h, _ = jax.lax.scan(body, x, None, length=L)
            return jnp.sum(h.astype(jnp.float32))

        def loop_gelu(x):
            def it(i, c):
                g = jax.grad(gelu_chain)(rot(c, i))
                return c + 1e-20 * g.astype(c.dtype)
            return jnp.sum(jax.lax.fori_loop(0, ITERS, it, x)
                           .astype(jnp.float32))
        timed("gelu_bwd", loop_gelu, xw)

    if "attn_pair" in which:
        from missm_tpu.ops.attention import multi_head_attention
        ap = {k: {kk: vv[0] for kk, vv in v.items()}
              for k, v in blocks["attn"].items()}

        def attn_chain(ap, x):
            def body(h, _):
                h = multi_head_attention(ap, h, num_heads=H,
                                         lora_scaling=SCALING)
                return h, None
            h, _ = jax.lax.scan(body, x, None, length=L)
            return jnp.sum(h.astype(jnp.float32))

        def loop_attn(ap, x):
            def it(i, c):
                g = jax.grad(attn_chain, argnums=1)(ap, rot(c, i))
                return c + 1e-20 * g.astype(c.dtype)
            return jnp.sum(jax.lax.fori_loop(0, ITERS, it, x)
                           .astype(jnp.float32))
        timed("attn_pair", loop_attn, ap, x0)

    if "lora_dots" in which:
        a = jnp.asarray(rng.standard_normal((D, 2)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((2, D)), jnp.bfloat16)
        x2 = x0.reshape(-1, D)

        def lora_chain(ab, x):
            a, b = ab

            def body(h, _):
                gb = jnp.dot(h, b.T, preferred_element_type=jnp.float32)
                da = jnp.dot(h.T, gb.astype(h.dtype),
                             preferred_element_type=jnp.float32)
                xa = jnp.dot(h, a, preferred_element_type=jnp.float32)
                db = jnp.dot(xa.astype(h.dtype).T, h,
                             preferred_element_type=jnp.float32)
                h = h + 1e-20 * (da[:1, :1] + db[:1, :1]).astype(h.dtype)
                return h, None
            h, _ = jax.lax.scan(body, x, None, length=4 * L)
            return jnp.sum(h.astype(jnp.float32))

        def loop_lora(ab, x):
            def it(i, c):
                return c + 1e-20 * lora_chain(ab, rot(x, i) + 0 * c)
            return jax.lax.fori_loop(0, ITERS, it, jnp.float32(0))
        timed("lora_dots", loop_lora, (a, b), x2)

    if "prod" in which:
        from missm_tpu.models.tower import _encoder

        def stack(blocks, x):
            return _encoder(blocks, x, num_heads=H, act=ACT,
                            eps=cfg.layer_norm_eps,
                            lora_scaling=SCALING,
                            remat="save_attn_mlp_qkv")

        def merge(lo, re):
            if isinstance(re, dict):
                return {k: merge(lo[k] if lo else None, re[k])
                        for k in re}
            return re if lo is None else lo

        def loss(lora_ab, rest, x):
            h = stack(merge(lora_ab, rest), x)
            return jnp.sum(h.astype(jnp.float32))

        def split2(tree, path=()):
            if isinstance(tree, dict):
                lo, re = {}, {}
                for k, v in tree.items():
                    l, r = split2(v, path + (k,))
                    lo[k], re[k] = l, r
                return lo, re
            if path and path[-1] in ("lora_a", "lora_b"):
                return tree, None
            return None, tree

        lora_ab, rest = split2(blocks)

        def loop_prod(lora_ab, rest, x):
            def it(i, c):
                g = jax.grad(loss, argnums=0)(lora_ab, rest, rot(c, i))
                leaf = jax.tree_util.tree_leaves(g)[0]
                return c + 1e-20 * jnp.sum(leaf).astype(c.dtype)
            return jnp.sum(jax.lax.fori_loop(0, ITERS, it, x)
                           .astype(jnp.float32))
        timed("prod", loop_prod, lora_ab, rest, x0)


if __name__ == "__main__":
    main()
