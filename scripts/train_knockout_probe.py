"""Train-step knockout: where do the ~250 ms at b64 go?

Variants (each timed as an in-jit fori_loop, one dispatch/readback):
  full      : value_and_grad + Adam update (the bench_train step)
  grads     : value_and_grad only, no optimizer — isolates opt+apply
  fusion    : grads wrt the fusion head only (towers as constants) —
              forward + trivial bwd, isolates the tower backward
  fwd       : loss only, train=True — train-mode forward

Run with an absolute path; bootstraps sys.path.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.core.config import languagebind_large
from missm_tpu.models.finetune import ModelConfig, init_model_params
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.train.step import (compute_loss, init_train_state,
                                  make_train_step, partition_trainable,
                                  combine_params)

ITERS = 10
B = 64


def _timed(tag, loop, *args):
    float(jnp.asarray(loop(*args), jnp.float32))  # compile+warm
    t0 = time.perf_counter()
    float(jnp.asarray(loop(*args), jnp.float32))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{tag:8s}: {dt * 1e3:7.1f} ms/step  ({B / dt:.1f} samples/s)",
          flush=True)
    return dt


def main():
    run = set(sys.argv[1:]) or {"full", "grads", "fusion", "fwd"}
    enable_compilation_cache()
    towers = (("image", languagebind_large("image")),)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion,
                      compute_dtype="bfloat16", remat="save_attn_mlp")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx)

    rng = np.random.default_rng(0)
    ids = np.full((B, 77), 49407, np.int32)
    ids[:, 0] = 49406
    ids[:, 1:12] = rng.integers(1, 40000, size=(B, 11))
    data = {
        "language": jnp.asarray(ids),
        "image": jnp.asarray(rng.standard_normal((B, 3, 224, 224)),
                             dtype=jnp.float32),
    }
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    missing = jnp.asarray(rng.choice([0, 1, 4], B), jnp.int32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def full(state, data, labels, missing, key):
        def body(i, carry):
            state, acc = carry
            state, m = step(state, data, labels, missing, 1e-4, key)
            return (state, acc + m["loss"].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, ITERS, body, (state, jnp.float32(0)))
        return acc
    if "full" in run:
        _timed("full", full, state, data, labels, missing, key)

    treedef, trainable, frozen = partition_trainable(params, cfg)

    def loss_tp(tp, fz, data):
        # fz passed as an argument, not closed over (constants pitfall)
        p = combine_params(treedef, tp, fz)
        return compute_loss(p, None, cfg, data, labels, missing, key)

    @jax.jit
    def grads_only(tp, fz, data):
        def body(i, carry):
            img, acc = carry
            (l, _), g = jax.value_and_grad(loss_tp, has_aux=True)(
                tp, fz, dict(data, image=img))
            # consume one element of every grad leaf so none is dead code
            gn = sum(x.ravel()[0].astype(jnp.float32)
                     for x in jax.tree_util.tree_leaves(g))
            img = img + (l * 0).astype(img.dtype)
            return (img, acc + l.astype(jnp.float32) + gn * 1e-12)
        _, acc = jax.lax.fori_loop(0, ITERS, body,
                                   (data["image"], jnp.float32(0)))
        return acc
    if "grads" in run:
        _timed("grads", grads_only, trainable, frozen, data)

    def loss_fusion(fp, enc, data):
        # enc passed as an argument: closing over it would embed the tower
        # as program constants (the docs/PERF.md measurement pitfall)
        p = {"encoder": enc, "fusion": fp}
        return compute_loss(p, None, cfg, data, labels, missing, key)

    @jax.jit
    def fusion_only(fp, enc, data):
        def body(i, carry):
            img, acc = carry
            (l, _), g = jax.value_and_grad(loss_fusion, has_aux=True)(
                fp, enc, dict(data, image=img))
            img = img + (l * 0).astype(img.dtype)
            return (img, acc + l.astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, ITERS, body,
                                   (data["image"], jnp.float32(0)))
        return acc
    if "fusion" in run:
        _timed("fusion", fusion_only, params["fusion"], params["encoder"],
               data)

    @jax.jit
    def fwd_only(tp, fz, data):
        def body(i, carry):
            img, acc = carry
            l, _ = loss_tp(tp, fz, dict(data, image=img))
            img = img + (l * 0).astype(img.dtype)
            return (img, acc + l.astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, ITERS, body,
                                   (data["image"], jnp.float32(0)))
        return acc
    if "fwd" in run:
        _timed("fwd", fwd_only, trainable, frozen, data)


if __name__ == "__main__":
    main()
