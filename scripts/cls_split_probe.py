"""Time the CLS-split attention kernels vs the full-K packed kernels at
ViT-L shapes (B=64, N=257, H=16, hd=64) on the attached TPU, and check
numerics on-device. docs/PERF.md: the full-K score dots pad the 257-key
lane axis to 3x128 tiles; the split should remove ~1/3 of the score-dot
FLOPs in both directions."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.kernels.flash_attention import (
    _einsum_reference, fused_attention, fused_attention_bwd,
    fused_attention_cls, fused_attention_cls_bwd)

B, N, H, HD = 64, 257, 16, 64
D = H * HD
ITERS = 50


def chain_time(fn, args, iters=ITERS, warmup=3):
    x = args[0]
    for _ in range(warmup):
        out = fn(x, *args[1:])
        leaf = out[0] if isinstance(out, (tuple, list)) else out
        x = x + (leaf.ravel()[0] * 0).astype(x.dtype)
    jax.block_until_ready(out)
    float(jnp.asarray(leaf, jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x, *args[1:])
        leaf = out[0] if isinstance(out, (tuple, list)) else out
        x = x + (leaf.ravel()[0] * 0).astype(x.dtype)
    float(jnp.asarray(leaf, jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    kc, km = k[:, :1], k[:, 1:]
    vc, vm = v[:, :1], v[:, 1:]

    full = jax.jit(lambda q, k, v: fused_attention(q, k, v, H))
    split = jax.jit(lambda q, kc, km, vc, vm: fused_attention_cls(
        q, kc, km, vc, vm, H))

    # numerics vs einsum reference (bf16 tolerance)
    ref = np.asarray(_einsum_reference(q, k, v, H), np.float32)
    got = np.asarray(split(q, kc, km, vc, vm), np.float32)
    err = np.max(np.abs(got - ref))
    print(f"fwd split max|err| vs einsum: {err:.4f}")

    # interleave A/B rounds: the shared tunnel adds multi-ms noise between
    # runs — per-variant MIN over rounds is the robust device-time estimate
    tf, ts = [], []
    for _ in range(5):
        tf.append(chain_time(lambda q: full(q, k, v), (q,)))
        ts.append(chain_time(lambda q: split(q, kc, km, vc, vm), (q,)))
    t_full, t_split = min(tf), min(ts)
    print(f"fwd  full-K : {t_full:6.3f} ms   split: {t_split:6.3f} ms  "
          f"({(1 - t_split / t_full) * 100:+.1f}%)   "
          f"all={[f'{a:.2f}/{b:.2f}' for a, b in zip(tf, ts)]}")

    bfull = jax.jit(lambda q, k, v, g: fused_attention_bwd(q, k, v, g, H))
    bsplit = jax.jit(lambda q, kc, km, vc, vm, g: fused_attention_cls_bwd(
        q, kc, km, vc, vm, g, H))

    rd = bfull(q, k, v, g)
    sd = bsplit(q, kc, km, vc, vm, g)
    err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
              for a, b in [(rd[0], sd[0]),
                           (rd[1][:, :1], sd[1]), (rd[1][:, 1:], sd[2]),
                           (rd[2][:, :1], sd[3]), (rd[2][:, 1:], sd[4])])
    print(f"bwd split max|err| vs full-K kernel: {err:.4f}")

    tbf, tbs = [], []
    for _ in range(5):
        tbf.append(chain_time(lambda q: bfull(q, k, v, g), (q,)))
        tbs.append(chain_time(lambda q: bsplit(q, kc, km, vc, vm, g), (q,)))
    t_bfull, t_bsplit = min(tbf), min(tbs)
    print(f"bwd  full-K : {t_bfull:6.3f} ms   split: {t_bsplit:6.3f} ms  "
          f"({(1 - t_bsplit / t_bfull) * 100:+.1f}%)   "
          f"all={[f'{a:.2f}/{b:.2f}' for a, b in zip(tbf, tbs)]}")


if __name__ == "__main__":
    main()
