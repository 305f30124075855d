"""Audio-tower attention tile economics (VERDICT r2 next #4): the audio
grid is 8x74 patches + CLS = N=593 tokens. The packed kernel's score dots
contract a 593-lane key axis, which Mosaic pads to ceil(593/128)=5 lane
tiles (640). The verdict suggested "pad keys to a lane multiple with -inf
bias" to reach "the 592-key floor" — but any MXU formulation needs
ceil(593/128)=5 tiles: 592 non-CLS keys still span 5 tiles (4x128+80),
and the CLS-fold trick only removes ONE column. 640 lanes IS the tile
floor for this N; what padding with an explicit kbias *can* change is
Mosaic's masked handling of the ragged final tile (implicit padding of
iotas/max/staging) vs clean aligned tiles plus 47 -inf keys.

This probe measures, at the audio tower's shapes (B=16 eval / B=8 train,
H=16, hd=64, bf16):
  a) fused packed kernel, N=593 (current production path)
  b) fused packed kernel, N_k padded to 640 with -inf key bias
  c) XLA einsum attention, N=593
fwd and fwd+bwd, in-jit REPEAT loops (one dispatch, one readback).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.kernels.flash_attention import (_einsum_reference,
                                               fused_attention,
                                               fused_attention_ad)

REPEAT = 50
H, HD = 16, 64
D = H * HD


def _timed(tag, loop, *args):
    float(jnp.asarray(loop(*args), jnp.float32))
    t0 = time.perf_counter()
    float(jnp.asarray(loop(*args), jnp.float32))
    dt = (time.perf_counter() - t0) / REPEAT
    print(f"{tag:28s}: {dt * 1e3:7.3f} ms/call", flush=True)
    return dt


def _loop(fn, *tensors):
    @jax.jit
    def loop(*ts):
        def body(i, carry):
            chain, acc = carry
            out = fn(ts[0] + (acc * 0).astype(ts[0].dtype), *ts[1:])
            s = jnp.sum(out[0] if isinstance(out, tuple) else out,
                        dtype=jnp.float32)
            return (chain, acc + s * 0 + 1)
        _, acc = jax.lax.fori_loop(0, REPEAT, body, (ts[0], jnp.float32(0)))
        return acc
    return lambda: loop(*tensors)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for B in (16, 8):
        N = 593
        NP = 640
        q = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
        pad = NP - N
        kp = jnp.concatenate([k, jnp.zeros((B, pad, D), k.dtype)], axis=1)
        vp = jnp.concatenate([v, jnp.zeros((B, pad, D), v.dtype)], axis=1)
        qp = jnp.concatenate([q, jnp.zeros((B, pad, D), q.dtype)], axis=1)
        kbias = jnp.concatenate(
            [jnp.zeros((B, 1, N), jnp.float32),
             jnp.full((B, 1, pad), jnp.finfo(jnp.float32).min)], axis=2)

        print(f"--- B={B} (audio tower shapes) ---", flush=True)
        _timed("fwd fused N=593",
               _loop(lambda q: fused_attention(q, k, v, H), q))
        _timed("fwd fused N=640+kbias",
               _loop(lambda q: fused_attention(q, kp, vp, H, kbias=kbias),
                     qp))
        _timed("fwd einsum N=593",
               _loop(lambda q: _einsum_reference(q, k, v, H), q))

        def g_fused(qq):
            return jax.grad(lambda a: jnp.sum(
                fused_attention_ad(a, k, v, H).astype(jnp.float32)))(qq)

        def g_einsum(qq):
            return jax.grad(lambda a: jnp.sum(
                _einsum_reference(a, k, v, H).astype(jnp.float32)))(qq)

        _timed("fwd+bwd fused N=593", _loop(g_fused, q))
        _timed("fwd+bwd einsum N=593", _loop(g_einsum, q))


if __name__ == "__main__":
    main()
