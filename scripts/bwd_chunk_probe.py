"""Backward instance-count scheduling sweep (round 4).

The FORWARD composed 24-layer stack has a measured U-curve over instance
count with its minimum at 64 (b128_chunk_probe: 1312/1152/1101/1186/1190
us/inst at 16/32/64/96/128) — the basis for the production
chunk_instances=64. The BACKWARD's curve has never been measured, and the
backward runs ~34% utilization on its executed FLOPs (PERF.md
"FLOP-accounted MFU") with "composed-schedule utilization" as the pinned
explanation. If the backward's scheduling optimum sits BELOW 64
instances, in-jit microbatched gradient accumulation (built: `--grad_accum`,
train/step.py:138) would lift the train metrics at zero model change.

  stack  fwd+bwd of the production 24-block stack wrt the LoRA partition
         (save_attn_mlp_qkv remat — the bench config) at inst in
         {16, 32, 64, 96, 128}, us/instance
  full   bench_train (B=64, bench config) at accum_steps in {1, 2, 4} —
         microbatches of 64/32/16 instances inside one jitted step

Run: python scripts/bwd_chunk_probe.py [stack|full|all]
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
from missm_tpu.models.tower import _encoder, init_vision_params
from missm_tpu.ops.basic import get_activation

ITERS = 10
cfg = languagebind_large("image").vision
N = cfg.num_patches + 1
D = cfg.hidden_size
H = cfg.num_heads
SCALING = cfg.lora_alpha / cfg.lora_r if cfg.lora_r else None
ACT = get_activation(cfg.hidden_act)


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


def bench_stack_bwd(n_inst):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((n_inst, N, D)), jnp.bfloat16)
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16)
        if t.dtype == jnp.float32 else t, params)
    lora_ab, rest = split2(params["blocks"])

    def loss(lora_ab, rest, x):
        h = _encoder(merge(lora_ab, rest), x, num_heads=H, act=ACT,
                     eps=cfg.layer_norm_eps, lora_scaling=SCALING,
                     remat="save_attn_mlp_qkv")
        return jnp.sum(h.astype(jnp.float32))

    @jax.jit
    def loop(lora_ab, rest, x):
        def it(i, c):
            g = jax.grad(loss, argnums=0)(lora_ab, rest, c * (1.0 + 0.0 * i))
            leaf = jax.tree_util.tree_leaves(g)[0]
            return c + 1e-20 * jnp.sum(leaf).astype(c.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, it, x)
                       .astype(jnp.float32))

    float(jnp.asarray(loop(lora_ab, rest, x0), jnp.float32))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(loop(lora_ab, rest, x0), jnp.float32))
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"stack fwd+bwd inst={n_inst:4d}: {best * 1e3:7.2f} ms "
          f"({best / n_inst * 1e6:6.0f} us/instance)", flush=True)
    return best


def bench_full_accum(accum, remat="save_attn_mlp_qkv"):
    import bench
    from missm_tpu.models.finetune import ModelConfig, init_model_params
    from missm_tpu.models.fusion import FusionConfig
    from missm_tpu.train.step import init_train_state, make_train_step

    B = 64
    towers = (("image", languagebind_large("image")),)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    mcfg = ModelConfig(towers=towers, fusion=fusion,
                       compute_dtype="bfloat16", remat=remat)
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    state, tx = init_train_state(params, mcfg)
    step = make_train_step(mcfg, tx, accum_steps=accum)

    rng = np.random.default_rng(0)
    data = {
        "language": jnp.asarray(bench._text_ids(rng, B)),
        "image": jnp.asarray(rng.standard_normal((B, 3, 224, 224)),
                             dtype=jnp.float32),
    }
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    missing = jnp.asarray(rng.choice([0, 1, 4], B), jnp.int32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def loop(state, data, labels, missing, key):
        def body(i, carry):
            state, acc = carry
            state, m = step(state, data, labels, missing, 1e-4,
                            jax.random.fold_in(key, i))
            return (state, acc + m["loss"].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, ITERS, body, (state, jnp.float32(0)))
        return acc

    dt = bench._time_loop(loop, state, data, labels, missing, key)
    rate = B * ITERS / dt
    print(f"train b{B} accum={accum} remat={remat}: {rate:6.1f} samples/s "
          f"({dt / ITERS * 1e3:.1f} ms/step)", flush=True)
    return rate


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    # non-integer trailing args select the remat policy for `full` mode
    # (default save_attn_mlp_qkv — the r4 sweep-era config; pass
    # save_attn_mlp_qkv_kern to reproduce the final 279.3 bench config)
    rest, remat = [], "save_attn_mlp_qkv"
    for a in sys.argv[2:]:
        if a.lstrip("-").isdigit():
            rest.append(int(a))
        else:
            remat = a
    enable_compilation_cache()
    if which in ("stack", "all"):
        for n in (rest or (64, 32, 16, 96, 128)):
            bench_stack_bwd(n)
    if which in ("full", "all"):
        for accum in (rest or (1, 2, 4)):
            bench_full_accum(accum, remat=remat)


if __name__ == "__main__":
    main()
