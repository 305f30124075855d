"""Fused self-attention Pallas kernel for the ViT towers.

Why: at ViT-L shapes (B=64, H=16, N=257) the XLA path materializes per-layer
f32 score matrices [B*H, N, N] in HBM — ~4 HBM passes over ~270 MB per
layer, which measures as ~70% of the tower's step time on v5e (bandwidth
bound; see scripts/attn_probe.py). The sequences are short (257 image
tokens, 77 text tokens — SURVEY §5 'long-context: absent'), so no tiled
flash decomposition is needed: one grid step computes whole (batch, head)
instances with the [N, N] scores resident in VMEM.

Layout: q/k/v arrive in the projections' natural [B, N, H*hd] layout and
the output is written back in the same layout — the (B,N,H,hd)->(B,H,N,hd)
transpose copies of the einsum formulation disappear entirely. The grid is
(B, H/G): each step slices G heads' columns via the BlockSpec index map (no
host-side reshape/pad), transposes [N, G, hd] -> [G, N, hd] inside VMEM,
and runs a G-batched dot.

VMEM per step (G=4, N=257, hd=64): qkv+out ~0.5 MB + scores f32 ~1.1 MB.

Numerics match the einsum path (f32 accumulation + f32 softmax); the
backward pass is a custom VJP with the standard attention gradient as XLA
einsums (scores materialize in bwd only — fuse later if training becomes
attention-bound).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, qs, ks, vs, *, group: int,
                 head_dim: int, scale: float, batch_block: int,
                 block_diag: int = 0):
    # Stage per-head lane slices into head-major [G, N, hd] VMEM scratch
    # (Mosaic cannot lane-split a reshape, so the relayout is explicit
    # copies), then ONE G-batched dot -> ONE softmax -> ONE batched dot —
    # measured slightly faster than per-head op chains
    # (scripts/ablation_probe.py).
    for b in range(batch_block):
        for g in range(group):
            sl = slice(g * head_dim, (g + 1) * head_dim)
            qs[g] = q_ref[b, :, sl]
            ks[g] = k_ref[b, :, sl]
            vs[g] = v_ref[b, :, sl]

        s = jax.lax.dot_general(
            qs[...], ks[...],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # [G, N, N] f32

        if block_diag:
            # packed short-sequence mode: rows may only attend within their
            # own `block_diag`-sized instance
            n = s.shape[1]
            r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // block_diag
            c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // block_diag
            s = jnp.where((r == c)[None], s, jnp.finfo(jnp.float32).min)

        m = jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=2, keepdims=True)).astype(qs.dtype)

        o = jax.lax.dot_general(
            p, vs[...], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [G, N, hd]
        for g in range(group):
            sl = slice(g * head_dim, (g + 1) * head_dim)
            o_ref[b, :, sl] = o[g].astype(o_ref.dtype)


def fused_attention(q, k, v, num_heads: int, group: int | None = None,
                    batch_block: int = 1, block_diag: int = 0,
                    interpret: bool = False):
    """q, k, v: [B, N, D_model] (natural projection layout) ->
    out [B, N, D_model]. Scale (head_dim**-0.5) applied inside.

    `group` = heads per grid step; `batch_block` = images per grid step —
    both amortize grid/DMA overhead (measured best at group 16 for ViT-L
    on v5e — scripts/ablation_probe.py). `block_diag=T` confines attention
    to T-sized blocks along the sequence (packed short-sequence mode)."""
    import math

    B, N, D = q.shape
    hd = D // num_heads
    # Group selection among divisors of num_heads:
    # - Mosaic lane constraint: block last dim (G*hd) must be 128-divisible
    #   (or the full model dim, i.e. G == num_heads);
    # - VMEM budget: the f32 score block is G*N*N*4 bytes + staging; cap so
    #   long sequences (audio tower: N=593) fit in ~10 of the 16 MB;
    # - otherwise prefer the largest group <= 16 (amortizes grid overhead —
    #   scripts/ablation_probe.py).
    def _lane_ok(g):
        return (g * hd) % 128 == 0 or g == num_heads

    def _fits(g):
        return g * (N * N * 4 + 6 * N * hd) <= 10 * 1024 * 1024

    divisors = [d for d in range(1, num_heads + 1) if num_heads % d == 0]
    lane_valid = [d for d in divisors if _lane_ok(d)]
    candidates = [d for d in lane_valid if _fits(d) and d <= max(group or 16,
                                                                 1)]
    if group is not None and num_heads % group == 0 and _lane_ok(group):
        chosen = group if _fits(group) else (max(candidates)
                                             if candidates else min(lane_valid))
    else:
        chosen = max(candidates) if candidates else min(lane_valid)
    group = chosen
    bb = math.gcd(B, batch_block)
    kernel = functools.partial(_attn_kernel, group=group, head_dim=hd,
                               scale=hd ** -0.5, batch_block=bb,
                               block_diag=block_diag)
    spec = pl.BlockSpec((bb, N, group * hd), lambda b, h: (b, 0, h),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // bb, num_heads // group),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((group, N, hd), q.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * N * N * hd,
            bytes_accessed=4 * B * N * D * q.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(q, k, v)


def _block_diag_bias(n: int, block: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // block
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // block
    return jnp.where(r == c, 0.0, jnp.finfo(jnp.float32).min)


def _einsum_reference(q, k, v, num_heads: int, block_diag: int = 0):
    """XLA formulation on the same [B, N, D] layout (bwd + CPU fallback)."""
    B, N, D = q.shape
    hd = D // num_heads
    scale = hd ** -0.5
    qh = q.reshape(B, N, num_heads, hd)
    kh = k.reshape(B, N, num_heads, hd)
    vh = v.reshape(B, N, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh,
                   preferred_element_type=jnp.float32)
    if block_diag:
        s = s + _block_diag_bias(N, block_diag)[None, None]
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return o.reshape(B, N, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention_ad(q, k, v, num_heads: int, block_diag: int = 0):
    return fused_attention(q, k, v, num_heads, block_diag=block_diag)


def _fa_fwd(q, k, v, num_heads, block_diag):
    return fused_attention(q, k, v, num_heads,
                           block_diag=block_diag), (q, k, v)


def _fa_bwd(num_heads, block_diag, res, g):
    q, k, v = res
    B, N, D = q.shape
    hd = D // num_heads
    scale = hd ** -0.5
    qh = q.reshape(B, N, num_heads, hd).astype(jnp.float32)
    kh = k.reshape(B, N, num_heads, hd).astype(jnp.float32)
    vh = v.reshape(B, N, num_heads, hd).astype(jnp.float32)
    gh = g.reshape(B, N, num_heads, hd).astype(jnp.float32)

    s = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh)
    if block_diag:
        s = s + _block_diag_bias(N, block_diag)[None, None]
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gh)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gh, vh)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kh) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qh) * scale
    return (dq.reshape(B, N, D).astype(q.dtype),
            dk.reshape(B, N, D).astype(k.dtype),
            dv.reshape(B, N, D).astype(v.dtype))


fused_attention_ad.defvjp(_fa_fwd, _fa_bwd)


def attention_available() -> bool:
    """Fused kernel usable on the current default backend."""
    return jax.default_backend() == "tpu"
