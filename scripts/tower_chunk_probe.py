"""Probe: per-tower chunk_instances as the backward-schedule lever
(round 5 — VERDICT r4 "Next round #1").

The composed fwd+bwd ViT-L stack schedules best at 16-32 instances
(scripts/bwd_chunk_probe.py: 2875/2855/2955 us/inst at 16/32/64), but
whole-step gradient accumulation REFUTED on train3 (21.02 flat vs
20.28/20.05 at accum 2/4) because the mixed-tower step re-runs
audio+text+fusion sequencing per microbatch. This probe chunks ONLY the
offending tower via `chunk_instances` (vision_features' existing
whole-video chunking): the tower's forward AND backward then run as
sequential 32- or 16-instance programs inside the same jit, while the
other towers and fusion run once — no accumulation tax, no extra Adam
traffic, math-identical (the chunks are exact slices; concat VJP
slices the cotangent).

train3 (B=8 videos x 8 frames = 64 video instances): video chunk
{None, 32, 16}, plus the image-side remat-policy flip analog
(qkv_kern won at 16-inst image microbatches; on video at 64 inst it
regressed 11% — the smaller live set may flip it back).

train (B=64 images): image chunk {32, 16} at accum=1 vs the shipped
4x16 accumulation — if flat-b64 with a chunked tower matches accum=4,
the simpler config wins (no microbatch rng split, no loss-weighting
path).

Run: python scripts/tower_chunk_probe.py [config_index ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QKV_KERN_VIDEO = (("video", "save_attn_mlp_qkv_kern"),
                  ("audio", "save_attn_mlp_kern"),
                  ("language", "save_attn_mlp"))

CONFIGS = [
    # --- train3 (bench config: accum=1, per-tower remat, frozen_bf16) ---
    ("t3 control (video 64-inst)", "train3", dict()),
    ("t3 video chunk=32", "train3", dict(chunk=(("video", 32),))),
    ("t3 video chunk=16", "train3", dict(chunk=(("video", 16),))),
    ("t3 video chunk=32 + qkv_kern", "train3",
     dict(chunk=(("video", 32),), remat=QKV_KERN_VIDEO)),
    # --- train (image b64) ---
    ("tr control accum=4 (shipped)", "train", dict()),
    ("tr flat image chunk=32 qkv", "train",
     dict(accum_steps=1, remat="save_attn_mlp_qkv",
          chunk=(("image", 32),))),
    ("tr flat image chunk=16 qkv", "train",
     dict(accum_steps=1, remat="save_attn_mlp_qkv",
          chunk=(("image", 16),))),
    ("tr flat image chunk=16 qkv_kern", "train",
     dict(accum_steps=1, chunk=(("image", 16),))),
]


def main():
    import jax
    import jax.numpy as jnp

    from missm_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import bench

    picks = [int(a) for a in sys.argv[1:]] or range(len(CONFIGS))
    for i in picks:
        name, which, kw = CONFIGS[i]
        fn = bench.bench_train3 if which == "train3" else bench.bench_train
        try:
            r = fn(jnp, jax, **kw)
            print(f"[{i}] {name}: {r:.2f} samples/s/chip", flush=True)
        except Exception as e:
            print(f"[{i}] {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
