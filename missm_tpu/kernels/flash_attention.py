"""Fused self-attention Pallas kernel for the ViT towers.

The XLA path materializes per-layer logits [B*H, N, N] (f32) in HBM — at
ViT-L shapes (B=64, H=16, N=257) that is ~270 MB of write+read traffic per
layer, a large share of the tower's runtime on a bandwidth-bound chip. The
sequences here are short (257 image tokens, 8 frames, 77 text tokens —
SURVEY §5 'long-context: absent'), so instead of a tiled flash-attention
decomposition, one grid step computes a whole (batch, head) instance with
q/k/v resident in VMEM and the [N, N] score matrix never leaving the chip:

  grid = (B*H,); per step: q,k,v [N, D] -> scores f32 (VMEM) -> stable
  softmax -> out [N, D]

VMEM footprint per step at N_pad=264, D=64: ~0.5 MB — far under the 16 MB
budget, and the kernel needs no inter-step state. Padded key positions are
masked with -inf via a broadcasted iota; padded query rows produce garbage
the caller slices off.

Numerics match the einsum path (f32 accumulation via
preferred_element_type, f32 softmax) — asserted by tests against
ops.attention.multi_head_attention.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    q = q_ref[0]                                   # [Np, D]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # [Np, Np] f32, VMEM

    np_ = s.shape[1]
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    s = jnp.where(key_ids < n_valid, s, jnp.finfo(jnp.float32).min)

    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)

    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q, k, v, interpret: bool = False):
    """q, k, v: [BH, N, D] -> [BH, N, D]. Scale (D**-0.5) applied inside.

    D should be a multiple of 64 (ViT head dims are 64/128); N is padded to
    a sublane multiple internally. `interpret=True` runs the Pallas
    interpreter (CPU tests).
    """
    BH, N, D = q.shape
    scale = D ** -0.5
    n_pad = _round_up(N, 8)
    if n_pad != N:
        pad = [(0, 0), (0, n_pad - N), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    kernel = functools.partial(_attn_kernel, n_valid=N, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, n_pad, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, n_pad, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * n_pad * n_pad * D,
            bytes_accessed=4 * BH * n_pad * D * q.dtype.itemsize,
            transcendentals=BH * n_pad * n_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :N, :]


def _softmax_probs(q, k, scale):
    """Reference probabilities for the backward pass (XLA einsums; the
    [N, N] matrix materializes in the bwd only)."""
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    return jax.nn.softmax(s.astype(jnp.float32), axis=-1)


@jax.custom_vjp
def fused_attention_ad(q, k, v):
    return fused_attention(q, k, v)


def _fa_fwd(q, k, v):
    return fused_attention(q, k, v), (q, k, v)


def _fa_bwd(res, g):
    q, k, v = res
    D = q.shape[-1]
    scale = D ** -0.5
    p = _softmax_probs(q, k, scale)                       # [BH, N, N] f32
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bqk,bqd->bkd", p, gf)
    dp = jnp.einsum("bqd,bkd->bqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention_ad.defvjp(_fa_fwd, _fa_bwd)


def attention_available() -> bool:
    """Fused kernel usable on the current default backend."""
    return jax.default_backend() == "tpu"
