"""train3 knockout: where does the 3-tower (video+audio+language) TRAIN
step spend its time? (B=8, bf16, save_attn_mlp, the bench_train3 config.)

Variants, each an in-jit fori_loop (one dispatch, one readback):
  full     : value_and_grad over the trainable partition + Adam
  fwd      : loss only, train mode (no grads)
  fusion   : grads wrt the fusion head only (all towers constant)
  novideo  : full minus the video tower's trainables (video fwd-only)
  noaudio  : full minus the audio tower's trainables (audio fwd-only)

full - novideo  = the video tower's backward cost
full - noaudio  = the audio tower's backward cost

Run with an absolute path; bootstraps sys.path. Args: [variants...]
plus optional `remat=<spec>` (uniform or per-tower, routed through the
CLI validators; default = the bench_train3 config) and `frozen_bf16`
(bf16 storage for the frozen partition, also the bench default) and
`B=<n>` — so attribution can be measured under exactly the headline
configuration.
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
from missm_tpu.train.step import compute_loss
from missm_tpu.train.trainability import FROZEN, TRAIN, param_labels

ITERS = 5
B = 8
REMAT = (("video", "save_attn_mlp_qkv"), ("audio", "save_attn_mlp_kern"))
FROZEN_BF16 = True
_args = []
for _a in sys.argv[1:]:
    if _a.startswith("remat="):
        from missm_tpu.compat.args import _remat, _remat_value
        _spec = _a[len("remat="):]
        REMAT = _remat(_spec) if "=" in _spec else _remat_value(_spec)
    elif _a.startswith("B="):
        B = int(_a[2:])
    elif _a == "frozen_bf16":
        FROZEN_BF16 = True
    elif _a == "no_frozen_bf16":
        FROZEN_BF16 = False
    else:
        _args.append(_a)
sys.argv = [sys.argv[0]] + _args


def _timed(tag, loop, *args):
    float(jnp.asarray(loop(*args), jnp.float32))
    t0 = time.perf_counter()
    float(jnp.asarray(loop(*args), jnp.float32))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{tag:8s}: {dt * 1e3:7.1f} ms/step  ({B / dt:.1f} samples/s)",
          flush=True)
    return dt


def main():
    run = set(sys.argv[1:]) or {"full", "fwd", "fusion", "novideo", "noaudio"}
    enable_compilation_cache()
    towers = (("video", languagebind_large("video")),
              ("audio", languagebind_large("audio")))
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "video", "audio"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion,
                      compute_dtype="bfloat16", remat=REMAT)
    print(f"config: B={B} remat={REMAT!r} frozen_bf16={FROZEN_BF16}",
          flush=True)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    if FROZEN_BF16:
        from missm_tpu.train.trainability import cast_frozen_params
        params = cast_frozen_params(params, cfg)

    rng = np.random.default_rng(0)
    ids = np.full((B, 77), 49407, np.int32)
    ids[:, 0] = 49406
    ids[:, 1:12] = rng.integers(1, 40000, size=(B, 11))
    data = {
        "language": jnp.asarray(ids),
        "video": jnp.asarray(rng.standard_normal((B, 3, 8, 224, 224)),
                             jnp.bfloat16),
        "audio": jnp.asarray(rng.standard_normal((B, 3, 112, 1036)),
                             jnp.bfloat16),
    }
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    missing = jnp.asarray(rng.choice([0, 1, 2, 3], B), jnp.int32)
    key = jax.random.PRNGKey(0)

    def freeze_under(labels_tree, subtree_path):
        node = labels_tree
        for k in subtree_path[:-1]:
            node = node[k]
        node[subtree_path[-1]] = jax.tree_util.tree_map(
            lambda _: FROZEN, node[subtree_path[-1]])

    def make_step(extra_frozen=(), fusion_only=False, fwd_only=False):
        labels_t = param_labels(params, cfg)
        if fusion_only:
            labels_t = jax.tree_util.tree_map(lambda _: FROZEN, labels_t)
            labels_t["fusion"] = jax.tree_util.tree_map(
                lambda _: TRAIN, labels_t["fusion"])
        for path in extra_frozen:
            freeze_under(labels_t, path)
        p_flat, treedef = jax.tree_util.tree_flatten(params)
        l_flat = jax.tree_util.tree_flatten(labels_t)[0]
        trainable = [p if l == TRAIN else None
                     for p, l in zip(p_flat, l_flat)]
        frozen = [None if l == TRAIN else p
                  for p, l in zip(p_flat, l_flat)]

        import optax
        tx = optax.scale_by_adam()

        def loss_fn(trainable, d, key):
            full = treedef.unflatten([f if t is None else t
                                      for t, f in zip(trainable, frozen)])
            return compute_loss(full, None, cfg, d, labels, missing, key)

        # NOTE: trainable/frozen must be jit ARGUMENTS, not closures —
        # closed-over param trees embed as program constants and compile
        # forever (docs/PERF.md "Measurement pitfalls").
        if fwd_only:
            @jax.jit
            def loop(tr, fr, data, key):
                def body(i, carry):
                    chain, acc = carry
                    full = treedef.unflatten([f if t is None else t
                                              for t, f in zip(tr, fr)])
                    l, _ = compute_loss(full, None, cfg,
                                        dict(data, video=chain), labels,
                                        missing, jax.random.fold_in(key, i))
                    acc = acc + l.astype(jnp.float32)
                    chain = chain + (l * 0).astype(chain.dtype)
                    return (chain, acc)
                _, acc = jax.lax.fori_loop(0, ITERS, body,
                                           (data["video"], jnp.float32(0)))
                return acc
            return lambda: loop(trainable, frozen, data, key)

        opt0 = tx.init(trainable)

        @jax.jit
        def loop(tr0, fr, opt0, data, key):
            def lf(tr, d, k):
                full = treedef.unflatten([f if t is None else t
                                          for t, f in zip(tr, fr)])
                return compute_loss(full, None, cfg, d, labels, missing, k)

            def body(i, carry):
                tr, opt, acc = carry
                (l, _), g = jax.value_and_grad(lf, has_aux=True)(
                    tr, dict(data, video=data["video"]
                             + (acc * 0).astype(data["video"].dtype)),
                    jax.random.fold_in(key, i))
                up, opt = tx.update(g, opt, tr)
                tr = jax.tree_util.tree_map(lambda t, u: t - 1e-4 * u, tr, up)
                return (tr, opt, acc + l.astype(jnp.float32))
            _, _, acc = jax.lax.fori_loop(
                0, ITERS, body, (tr0, opt0, jnp.float32(0)))
            return acc
        return lambda: loop(trainable, frozen, opt0, data, key)

    if "fwd" in run:
        _timed("fwd", make_step(fwd_only=True))
    if "fusion" in run:
        _timed("fusion", make_step(fusion_only=True))
    if "full" in run:
        _timed("full", make_step())
    if "novideo" in run:
        _timed("novideo", make_step(extra_frozen=[("encoder", "video")]))
    if "noaudio" in run:
        _timed("noaudio", make_step(extra_frozen=[("encoder", "audio")]))


if __name__ == "__main__":
    main()
