"""Attribute the flagship eval step's time outside the 24-layer stack.

docs/PERF.md knockout-profiles the vision STACK (71.6 ms of the 97.6 ms
b64 eval step); this probe attributes the remaining ~26 ms by timing each
component of the step in isolation with the chained-dependency
methodology (per-step readbacks add ~25 ms tunnel RTT each — bench.py):

  full        the whole eval step (reference point)
  vision      vision_features alone (stack + embed + pools + projection)
  text        text_features alone (12-layer causal tower, 77 tokens)
  fusion      encode-outputs -> fusion head -> loss/softmax/argmax
  embed       vision_features with 0 encoder layers (patchify floor)
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
from missm_tpu.models.finetune import ModelConfig, init_model_params
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.models.tower import text_features, vision_features
from missm_tpu.train.step import make_eval_step

B = 64
ITERS = 20


def timed(fn, chain_in, chain_fn, iters=ITERS, warmup=3):
    x = chain_in
    for _ in range(warmup):
        out = fn(x)
        x = chain_fn(x, out)
    jax.block_until_ready(out)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
        x = chain_fn(x, out)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf, jnp.float32).ravel()[0])


def main():
    enable_compilation_cache()
    tower = languagebind_large("image")
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=(("image", tower),), fusion=fusion)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    rng = np.random.default_rng(0)
    ids_np = np.full((B, 77), 49407, np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1:12] = rng.integers(1, 40000, size=(B, 11))
    ids = jnp.asarray(ids_np)
    img = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    missing = jnp.asarray(rng.choice([0, 1, 4], B), jnp.int32)

    eval_step = make_eval_step(cfg)
    data = {"language": ids, "image": img}
    full = timed(lambda x: eval_step(params, dict(data, image=x), labels,
                                     missing),
                 img, lambda x, o: x + o["loss"].astype(x.dtype) * 0)
    print(f"full eval step      : {full:7.2f} ms  "
          f"({B / full * 1e3:.1f} samples/s)")

    enc_img = params["encoder"]["image"]

    @jax.jit
    def vis(p, x):
        return vision_features(p["vision"], tower.vision, x,
                               projection=p["proj"])

    v = timed(lambda x: vis(enc_img, x), img,
              lambda x, o: x + o.sum().astype(x.dtype) * 0)
    print(f"vision tower        : {v:7.2f} ms")

    enc_lang = params["encoder"]["language"]
    tcfg = tower.text

    @jax.jit
    def txt(p, t):
        _, pooled = text_features(p["text"], tcfg, t, projection=p["proj"])
        return pooled

    t = timed(lambda x: txt(enc_lang, x), ids,
              lambda x, o: x + (o.sum() * 0).astype(x.dtype))
    print(f"text tower          : {t:7.2f} ms")

    # fusion + loss on precomputed embeddings
    from missm_tpu.models.fusion import fusion_forward
    from missm_tpu.train.losses import per_sample_cross_entropy
    emb = {"language": jnp.asarray(rng.standard_normal((B, 768)), jnp.bfloat16),
           "image": jnp.asarray(rng.standard_normal((B, 768)), jnp.bfloat16)}

    @jax.jit
    def fuse(p, e):
        logits, _ = fusion_forward(p, cfg.fusion, e, missing, train=False)
        nll = per_sample_cross_entropy(logits, labels)
        return {"loss": nll.mean(), "probs": jax.nn.softmax(logits, -1),
                "preds": jnp.argmax(logits, -1)}

    f = timed(lambda e: fuse(params["fusion"], e), emb,
              lambda e, o: {k: v + o["loss"].astype(v.dtype) * 0
                            for k, v in e.items()})
    print(f"fusion head + loss  : {f:7.2f} ms")

    # embed floor: vision tower with the encoder stack sliced to 0 layers
    import dataclasses
    vcfg0 = dataclasses.replace(tower.vision, num_layers=0)
    blocks0 = jax.tree_util.tree_map(lambda a: a[:0], enc_img["vision"]["blocks"])
    vp0 = dict(enc_img["vision"], blocks=blocks0)

    @jax.jit
    def emb_only(p0, proj, x):
        return vision_features(p0, vcfg0, x, projection=proj)

    e = timed(lambda x: emb_only(vp0, enc_img["proj"], x), img,
              lambda x, o: x + o.sum().astype(x.dtype) * 0)
    print(f"vision embed floor  : {e:7.2f} ms")

    print(f"\nvision+text+fusion sum: {v + t + f:7.2f} ms "
          f"(vs full {full:.2f} -> overlap/dispatch {full - v - t - f:+.2f})")


if __name__ == "__main__":
    main()
