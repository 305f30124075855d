"""b128 eval regression root-cause sweep (VERDICT r2 weak #4 / next #8):
eval b128 measured 901 samples/s vs b64's 919 even though the >64-instance
path runs sequential 64-instance chunks. This sweeps chunk_instances over
{32, 64, 96, 128} at B=128 (and B=64 as control) on the CURRENT model
(post relayout/conv-embed/LoRA-VJP changes), plus a minimal composed-block
repro: the 24-layer ViT-L stack alone at 64 vs 96 vs 128 instances,
timed per instance — isolating XLA's scheduling of the composed block
from the fusion/text parts of the full step.

Run: python scripts/b128_chunk_probe.py [full|stack]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache

ITERS = 10


def bench_eval_chunk(B, chunk):
    import bench
    from missm_tpu.core.config import languagebind_large
    from missm_tpu.train.step import make_eval_step

    tower = languagebind_large("image")
    tower = dataclasses.replace(
        tower, vision=dataclasses.replace(tower.vision,
                                          chunk_instances=chunk))
    towers = (("image", tower),)
    cfg, params, data, labels, rng = bench._eval_model(
        jnp, jax, towers, ("language", "image"), B,
        {"image": (B, 3, 224, 224)})
    masks = jnp.stack([jnp.asarray(rng.choice([0, 1, 4], B), jnp.int32)
                       for _ in range(4)])
    eval_step = make_eval_step(cfg)

    @jax.jit
    def loop(params, data, labels, masks):
        def body(i, carry):
            chain, acc = carry
            out = eval_step(params, dict(data, image=chain), labels,
                            masks[i % 4])
            acc = acc + out["loss"].astype(jnp.float32)
            chain = chain + (out["loss"] * 0).astype(chain.dtype)
            return (chain, acc)
        _, acc = jax.lax.fori_loop(0, ITERS, body,
                                   (data["image"], jnp.float32(0)))
        return acc

    dt = bench._time_loop(loop, params, data, labels, masks)
    rate = B * ITERS / dt
    print(f"eval B={B:4d} chunk={chunk:4d}: {rate:7.1f} samples/s "
          f"({dt / ITERS * 1e3:.1f} ms/step)", flush=True)
    return rate


def bench_stack(n_inst):
    """The composed transformer stack alone at n_inst ViT instances."""
    from missm_tpu.core.config import languagebind_large
    from missm_tpu.models.tower import init_vision_params, _encoder
    from missm_tpu.ops.basic import get_activation

    vcfg = languagebind_large("image").vision
    params = init_vision_params(jax.random.PRNGKey(0), vcfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_inst, 257, 1024)), jnp.bfloat16)

    @jax.jit
    def loop(blocks, x):
        def body(i, carry):
            chain, acc = carry
            out = _encoder(blocks, chain, num_heads=vcfg.num_heads,
                           act=get_activation(vcfg.hidden_act),
                           eps=vcfg.layer_norm_eps,
                           lora_scaling=vcfg.lora_alpha / vcfg.lora_r)
            s = jnp.sum(out[:, 0, :].astype(jnp.float32))
            acc = acc + s
            chain = x + (s * 0).astype(x.dtype)
            return (chain, acc)
        _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))
        return acc

    import bench
    dt = bench._time_loop(loop, params["blocks"], x)
    per_inst = dt / ITERS / n_inst * 1e6
    print(f"stack inst={n_inst:4d}: {dt / ITERS * 1e3:7.1f} ms "
          f"({per_inst:.0f} us/instance)", flush=True)
    return per_inst


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "full"
    enable_compilation_cache()
    if which in ("full", "all"):
        bench_eval_chunk(64, 64)
        for chunk in (64, 96, 128, 32):
            bench_eval_chunk(128, chunk)
    if which in ("stack", "all"):
        for n in (64, 96, 128):
            bench_stack(n)


if __name__ == "__main__":
    main()
