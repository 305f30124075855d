"""Probe: does gradient accumulation unlock richer remat policies (or a
larger effective batch) for the train3 workload?

Rationale: at B=8 the video tower OOMs under save_attn_mlp_qkv next to
audio=save_attn_mlp_kern (docs/PERF.md), and B=16 OOMs the saved fc1
pre-activations outright. --grad_accum scans microbatches inside the
jitted step, so only ONE microbatch's activations are live — microbatch
4 (B=8, accum=2) or microbatch 8 (B=16, accum=2) may afford policies the
flat step cannot, at the cost of scan sequencing + a grad accumulator
(trainable partition only — LoRA + fusion, tiny).

Run: python scripts/train3_accum_probe.py [config_index ...]
Each config compiles fresh through the tunnel (1-4 min first time).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PER_TOWER = (("video", "save_attn_mlp"), ("audio", "save_attn_mlp_kern"),
             ("language", "save_attn_mlp"))
QKV_VIDEO = (("video", "save_attn_mlp_qkv"), ("audio", "save_attn_mlp_kern"),
             ("language", "save_attn_mlp"))
QKV_VIDEO_PLAIN_AUDIO = (("video", "save_attn_mlp_qkv"),
                         ("audio", "save_attn_mlp"),
                         ("language", "save_attn_mlp"))

CONFIGS = [
    ("B=8 accum=1 per-tower (prod)", dict(B=8, accum_steps=1,
                                          remat=PER_TOWER)),
    ("B=8 accum=2 video=qkv audio=kern", dict(B=8, accum_steps=2,
                                              remat=QKV_VIDEO)),
    ("B=16 accum=2 per-tower", dict(B=16, accum_steps=2, remat=PER_TOWER)),
    ("B=16 accum=2 video=qkv audio=kern", dict(B=16, accum_steps=2,
                                               remat=QKV_VIDEO)),
    ("B=8 accum=1 video=qkv audio=plain", dict(B=8, accum_steps=1,
                                               remat=QKV_VIDEO_PLAIN_AUDIO)),
    # round-4 follow-up to the image-train result (bwd_chunk_probe: the
    # composed BACKWARD schedules best at 16-32 instances; b64 accum=4
    # measures +3.4%). Bench-config remat + frozen_bf16 defaults.
    ("B=8 accum=1 bench config (control)", dict(B=8, accum_steps=1)),
    ("B=8 accum=2 bench config", dict(B=8, accum_steps=2)),
    ("B=8 accum=4 bench config", dict(B=8, accum_steps=4)),
    # the image-side policy FLIP (qkv_kern wins at 16-32-instance
    # microbatches, loses at 64 — bwd_chunk/remat_ab) applied to the
    # video tower: accum=2 halves its saves, so the kern variants that
    # OOM'd or regressed flat may now fit AND win. Audio keeps kern
    # (its 8->4-instance microbatches stay above the audio-kern
    # crossover); frozen_bf16 stays on (bench default).
    ("B=8 accum=2 video=qkv_kern", dict(
        B=8, accum_steps=2,
        remat=(("video", "save_attn_mlp_qkv_kern"),
               ("audio", "save_attn_mlp_kern"),
               ("language", "save_attn_mlp")))),
    ("B=8 accum=4 video=qkv_kern", dict(
        B=8, accum_steps=4,
        remat=(("video", "save_attn_mlp_qkv_kern"),
               ("audio", "save_attn_mlp_kern"),
               ("language", "save_attn_mlp")))),
]


def main():
    import jax
    import jax.numpy as jnp

    from missm_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import bench

    picks = [int(a) for a in sys.argv[1:]] or range(len(CONFIGS))
    for i in picks:
        name, kw = CONFIGS[i]
        try:
            r = bench.bench_train3(jnp, jax, **kw)
            print(f"[{i}] {name}: {r:.2f} samples/s/chip", flush=True)
        except Exception as e:
            print(f"[{i}] {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
