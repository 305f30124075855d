"""Block-scan `unroll` sweep (round 4).

Both residuals left in the perf story are composed-SCHEDULE utilization
(forward ~5 ms over floors, backward ~34% on executed FLOPs — PERF.md).
One scheduling lever has never been touched: `lax.scan(..., unroll=k)`
over the 24 stacked blocks. Unrolling gives XLA k adjacent layers in one
loop body to interleave (at k x compile time and program size); the
per-block jax.checkpoint wrapping is unchanged, so remat semantics are
identical. This mirrors _encoder's non-pipe scan (models/tower.py:443)
with unroll as a parameter:

  fwd    64-instance forward stack (the eval shape), unroll 1/2/4
  bwd    16-instance fwd+bwd wrt the LoRA partition under
         save_attn_mlp_qkv (the accum=4 train microbatch), unroll 1/2/4

Run: python scripts/scan_unroll_probe.py [fwd|bwd|all]
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
from missm_tpu.ops.basic import get_activation

ITERS = 10
cfg = languagebind_large("image").vision
N = cfg.num_patches + 1
D = cfg.hidden_size
H = cfg.num_heads
SCALING = cfg.lora_alpha / cfg.lora_r if cfg.lora_r else None
ACT = get_activation(cfg.hidden_act)


def make_stack(remat, unroll):
    def stack(blocks, x):
        def body(h, p):
            return _block_forward(p, h, num_heads=H, act=ACT,
                                  eps=cfg.layer_norm_eps,
                                  lora_scaling=SCALING, remat=remat), None
        h, _ = jax.lax.scan(body, x, blocks, unroll=unroll)
        return h
    return stack


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


def merge(lo, re):
    if isinstance(re, dict):
        return {k: merge(lo[k] if lo else None, re[k]) for k in re}
    return re if lo is None else lo


def _params(n_inst):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((n_inst, N, D)), jnp.bfloat16)
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16)
        if t.dtype == jnp.float32 else t, params)
    return params["blocks"], x0


def timed(tag, loop, *args):
    t0 = time.perf_counter()
    float(jnp.asarray(loop(*args), jnp.float32))
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(loop(*args), jnp.float32))
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"{tag}: {best * 1e3:7.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return best


def bench_fwd(unroll):
    blocks, x0 = _params(64)
    stack = make_stack(False, unroll)

    @jax.jit
    def loop(blocks, x):
        def it(i, c):
            h = stack(blocks, c * (1.0 + 0.0 * i))
            return c + 1e-20 * h.astype(c.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, it, x)
                       .astype(jnp.float32))
    timed(f"fwd  inst=64 unroll={unroll}", loop, blocks, x0)


def bench_bwd(unroll):
    blocks, x0 = _params(16)
    stack = make_stack("save_attn_mlp_qkv", unroll)
    lora_ab, rest = split2(blocks)

    def loss(lora_ab, rest, x):
        return jnp.sum(stack(merge(lora_ab, rest), x).astype(jnp.float32))

    @jax.jit
    def loop(lora_ab, rest, x):
        def it(i, c):
            g = jax.grad(loss, argnums=0)(lora_ab, rest, c * (1.0 + 0.0 * i))
            leaf = jax.tree_util.tree_leaves(g)[0]
            return c + 1e-20 * jnp.sum(leaf).astype(c.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, it, x)
                       .astype(jnp.float32))
    timed(f"bwd  inst=16 unroll={unroll}", loop, lora_ab, rest, x0)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    enable_compilation_cache()
    if which in ("fwd", "all"):
        for u in (1, 2, 4):
            bench_fwd(u)
    if which in ("bwd", "all"):
        for u in (1, 2, 4):
            bench_bwd(u)


if __name__ == "__main__":
    main()
