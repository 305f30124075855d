"""Attribute the eval stack's residual over its floors to LN / gelu /
residual-add elementwise traffic.

docs/PERF.md: the b64 eval step measures 67.3 ms vs a ~62 ms all-floors
sum (matmul 49.3 + fused attention 9.5 + text ~2 + fusion ~1) — the ~5 ms
gap is attributed to "LN/elementwise HBM traffic between the fused
regions", but never measured piecewise. This probe knocks each
elementwise family out of the PRODUCTION 24-layer block (real cls-split
attention path, folded LoRA, same scan) and times the stack in-jit:

  prod       ln + gelu + residuals (reference point)
  noln       both layer_norms -> pass-through
  nogelu     activation -> identity
  nores      residual adds dropped (branch output only)
  bare       all three knocked out (matmul+attention skeleton)

prod - noln ~= what a fused/eliminated LN could buy; same for the others.
Note knockouts also change what XLA can fuse, so deltas are upper bounds
on the win available from fusing that family better (not from removing
its mandatory HBM reads).

Run: python scripts/elementwise_probe.py [iters]
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
from missm_tpu.models.tower import init_vision_params
from missm_tpu.ops.attention import multi_head_attention
from missm_tpu.ops.basic import get_activation, layer_norm, linear

B = 64
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
ROUNDS = 3

cfg = languagebind_large("image").vision
N = cfg.num_patches + 1
D = cfg.hidden_size
H = cfg.num_heads
SCALING = cfg.lora_alpha / cfg.lora_r if cfg.lora_r else None


def make_stack(ln=True, gelu=True, res=True):
    act = get_activation(cfg.hidden_act)

    def block(p, x):
        h = layer_norm(p["ln1"], x, 1e-5) if ln else x
        a = multi_head_attention(p["attn"], h, num_heads=H,
                                 lora_scaling=SCALING)
        x = x + a if res else a
        h = layer_norm(p["ln2"], x, 1e-5) if ln else x
        wide = linear(p["mlp"]["fc1"], h)
        if gelu:
            wide = act(wide)
        m = linear(p["mlp"]["fc2"], wide)
        x = x + m if res else m
        return x

    @jax.jit
    def run(params, x0):
        def body(i, chain):
            def layer(h, p):
                return block(p, h), None
            out, _ = jax.lax.scan(layer, chain, params["blocks"])
            # loss-chained dependency: no iteration can be elided
            return chain + (jnp.sum(out[:1, :1]) * 0).astype(chain.dtype)
        return jax.lax.fori_loop(0, ITERS, body, x0)

    return run


def timed(run, params, x0):
    out = run(params, x0)
    float(jnp.asarray(out, jnp.float32)[0, 0, 0])  # warm + sync
    best = np.inf
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out = run(params, x0)
        float(jnp.asarray(out, jnp.float32)[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    return best


def main():
    enable_compilation_cache()
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    x0 = jax.device_put(
        (np.random.default_rng(0).standard_normal((B, N, D)) * 0.02
         ).astype(jnp.bfloat16))

    results = {}
    for name, kw in (("prod", {}),
                     ("noln", {"ln": False}),
                     ("nogelu", {"gelu": False}),
                     ("nores", {"res": False}),
                     ("bare", {"ln": False, "gelu": False, "res": False})):
        ms = timed(make_stack(**kw), params, x0)
        results[name] = ms
        print(f"{name:8s} {ms:7.2f} ms / 24 layers", flush=True)

    prod = results["prod"]
    for k in ("noln", "nogelu", "nores", "bare"):
        print(f"prod - {k:7s} = {prod - results[k]:+6.2f} ms")


if __name__ == "__main__":
    main()
