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

Numerics match the einsum path (f32 accumulation + f32 softmax). The
backward pass is a custom VJP: on TPU a second Pallas kernel recomputes
the scores in VMEM and produces (dq, dk, dv) in one pass — the f32
[B*H, N, N] score/probability HBM round-trips of the XLA einsum gradient
disappear (they re-paid in bwd exactly the bandwidth the forward kernel
eliminated). Elsewhere the einsum gradient is used.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_diag_mask_f32(s, block_diag):
    n = s.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // block_diag
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // block_diag
    return jnp.where((r == c)[None], s, jnp.finfo(jnp.float32).min)


def _causal_mask_f32(s):
    n = s.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where((c <= r)[None], s, jnp.finfo(jnp.float32).min)


def _softmax_f32(s):
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=2, keepdims=True)


def _fwd_budget(hd: int, N: int):
    """VMEM-fit predicate for the forward kernels: one f32 [G, N, N]
    score block + ~6 staged [N, hd] rows per head, capped at ~10 of the
    16 MB."""
    return lambda g: g * (N * N * 4 + 6 * N * hd) <= 10 * 1024 * 1024


def _bwd_budget(hd: int, N: int):
    """Backward is stricter: TWO f32 [G, N, N] live values (P and dP)
    plus seven I/O blocks; capped at 8 MB."""
    return lambda g: g * (2 * N * N * 4 + 16 * N * hd) <= 8 * 1024 * 1024


def _select_group(num_heads: int, hd: int, N: int, *, budget, cap: int,
                  requested: int | None = None, even_only: bool = False,
                  fallback_min: bool = False):
    """Head group for one kernel configuration — the ONE selector behind
    every fused-attention entry point (fwd/bwd, plain/cls-split).

    - Mosaic lane constraint: the block's last dim (G*hd) must be
      128-divisible, or G == num_heads (the full model dim);
    - `budget(g)` is the VMEM-fit predicate (_fwd_budget/_bwd_budget);
    - `cap` prefers the largest group below it (amortizes grid overhead
      — measured best at 16 fwd / 8 bwd, scripts/ablation_probe.py);
    - `even_only` for kernels where pair packing is mandatory.

    An explicitly `requested` group is VALIDATED, never substituted: a
    silent replacement mislabels probe data, and an unvalidated pass-
    through makes a non-divisor group drop heads (uninitialized output
    columns). Auto mode returns the best candidate, the smallest lane-
    valid group if nothing fits the budget (`fallback_min` — Mosaic
    still errors loudly if it truly cannot fit), or None."""
    def lane_ok(g):
        return (g * hd) % 128 == 0 or g == num_heads

    if requested is not None:
        if (num_heads % requested or not lane_ok(requested)
                or (even_only and requested % 2) or not budget(requested)):
            raise ValueError(
                f"invalid head group {requested} for num_heads={num_heads},"
                f" head_dim={hd}, N={N}: it must divide num_heads, keep "
                f"the block lane-aligned (group*head_dim % 128 == 0 or "
                f"group == num_heads),"
                + (" be even (pair packing)," if even_only else "")
                + " and fit the VMEM budget")
        return requested
    start, step = (2, 2) if even_only else (1, 1)
    lane_valid = [d for d in range(start, num_heads + 1, step)
                  if num_heads % d == 0 and lane_ok(d)]
    cands = [d for d in lane_valid if budget(d) and d <= cap]
    if cands:
        return max(cands)
    if fallback_min and lane_valid:
        return min(lane_valid)
    return None


def _attn_kernel_packed(q_ref, k_ref, v_ref, *rest, pairs: int,
                        head_dim: int, scale: float, batch_block: int,
                        block_diag: int = 0, causal: bool = False,
                        has_kbias: bool = False):
    # Head-PAIR packing: each scratch row holds two heads' 64-lane columns
    # as one 128-lane tile, so every VMEM copy is lane-aligned (the 64-lane
    # slices of the unpacked kernel each cost a relayout — measured ~22 ms
    # of the 73 ms b64 ViT-L step). Per-head separation happens inside the
    # dots: zero one parity's lanes on ONE operand and contract over the
    # full 128 lanes — the zeros contribute nothing, and the K=128 dot runs
    # the MXU at full contraction width (the K=64 dots ran it half-empty),
    # so the doubled dot count costs the same MXU passes.
    if has_kbias:
        kb_ref, o_ref, qs, ks, vs = rest
    else:
        kb_ref = None
        o_ref, qs, ks, vs = rest
    pw = 2 * head_dim
    n = qs.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, pw), 1)
    lo = (lane < head_dim)[None]
    for b in range(batch_block):
        for p in range(pairs):
            sl = slice(p * pw, (p + 1) * pw)
            qs[p] = q_ref[b, :, sl]
            ks[p] = k_ref[b, :, sl]
            vs[p] = v_ref[b, :, sl]

        q_all, k_all, v_all = qs[...], ks[...], vs[...]
        zero = jnp.zeros((), q_all.dtype)
        dn_qk = (((2,), (2,)), ((0,), (0,)))
        s_lo = jax.lax.dot_general(
            jnp.where(lo, q_all, zero), k_all, dn_qk,
            preferred_element_type=jnp.float32) * scale    # [P, N, N] f32
        s_hi = jax.lax.dot_general(
            jnp.where(lo, zero, q_all), k_all, dn_qk,
            preferred_element_type=jnp.float32) * scale
        if kb_ref is not None:
            # additive key-padding bias row [1, N] broadcast over P, queries
            kb = kb_ref[b].astype(jnp.float32)[None]       # [1, 1, N]
            s_lo = s_lo + kb
            s_hi = s_hi + kb
        if causal:
            s_lo = _causal_mask_f32(s_lo)
            s_hi = _causal_mask_f32(s_hi)
        if block_diag:
            s_lo = _block_diag_mask_f32(s_lo, block_diag)
            s_hi = _block_diag_mask_f32(s_hi, block_diag)
        # Deferred normalization: dot the UNnormalized exp(s - max) against
        # V and divide the [N, 2hd] result by the row sums afterwards — the
        # softmax division runs over N*2hd elements instead of N*N (and in
        # f32 after the f32-accumulated dot, so it's no less accurate).
        m_lo = jnp.max(s_lo, axis=2, keepdims=True)
        m_hi = jnp.max(s_hi, axis=2, keepdims=True)
        e_lo = jnp.exp(s_lo - m_lo)
        e_hi = jnp.exp(s_hi - m_hi)
        den_lo = jnp.sum(e_lo, axis=2, keepdims=True)      # [P, N, 1] f32
        den_hi = jnp.sum(e_hi, axis=2, keepdims=True)

        dn_av = (((2,), (1,)), ((0,), (0,)))
        o = jax.lax.dot_general(
            e_lo.astype(q_all.dtype), jnp.where(lo, v_all, zero), dn_av,
            preferred_element_type=jnp.float32) / den_lo
        o = o + jax.lax.dot_general(
            e_hi.astype(q_all.dtype), jnp.where(lo, zero, v_all), dn_av,
            preferred_element_type=jnp.float32) / den_hi   # [P, N, 2hd]
        for p in range(pairs):
            sl = slice(p * pw, (p + 1) * pw)
            o_ref[b, :, sl] = o[p].astype(o_ref.dtype)


def _attn_kernel_packed_cls(q_ref, kc_ref, km_ref, vc_ref, vm_ref, o_ref,
                            qs, ks, vs, kcs, vcs, *, pairs: int,
                            head_dim: int, scale: float, batch_block: int):
    """Head-pair-packed forward with the CLS key/value split out.

    The ViT sequence is 1 CLS + 256 patches (N = 257): a full-K score dot
    pads the 257-lane key axis to 3x128 tiles (~1.5x MXU waste — the
    measured bulk of the kernel's overhead over the matmul floor,
    docs/PERF.md). Here the caller passes the CLS key/value as separate
    [B, 1, D] refs, so the score/AV dots run on the 256 main tokens with
    EXACT 2x128 lane tiles, and the single CLS column is folded into the
    same softmax on the VPU (a lane-reduction and a broadcast multiply —
    no MXU tiles, no in-kernel slicing of the 257 axis, which is what
    crashes Mosaic's layout pass)."""
    pw = 2 * head_dim
    n = qs.shape[1]
    nm = ks.shape[1]
    lo_q = (jax.lax.broadcasted_iota(jnp.int32, (n, pw), 1) < head_dim)[None]
    lo_m = (jax.lax.broadcasted_iota(jnp.int32, (nm, pw), 1) < head_dim)[None]
    lo_c = (jax.lax.broadcasted_iota(jnp.int32, (1, pw), 1) < head_dim)[None]
    dn_qk = (((2,), (2,)), ((0,), (0,)))
    dn_av = (((2,), (1,)), ((0,), (0,)))
    for b in range(batch_block):
        for p in range(pairs):
            sl = slice(p * pw, (p + 1) * pw)
            qs[p] = q_ref[b, :, sl]
            ks[p] = km_ref[b, :, sl]
            vs[p] = vm_ref[b, :, sl]
            kcs[p] = kc_ref[b, :, sl]
            vcs[p] = vc_ref[b, :, sl]
        q_all, k_all, v_all = qs[...], ks[...], vs[...]
        kc_all, vc_all = kcs[...], vcs[...]
        zero = jnp.zeros((), q_all.dtype)
        o = None
        for mq, mm, mc in ((lo_q, lo_m, lo_c), (~lo_q, ~lo_m, ~lo_c)):
            qm = jnp.where(mq, q_all, zero)
            s_m = jax.lax.dot_general(
                qm, k_all, dn_qk,
                preferred_element_type=jnp.float32) * scale   # [P, N, Nm]
            s_c = jnp.sum(qm.astype(jnp.float32)
                          * kc_all.astype(jnp.float32), axis=2,
                          keepdims=True) * scale               # [P, N, 1]
            m = jnp.maximum(jnp.max(s_m, axis=2, keepdims=True), s_c)
            e_m = jnp.exp(s_m - m)
            e_c = jnp.exp(s_c - m)
            den = jnp.sum(e_m, axis=2, keepdims=True) + e_c
            o_h = jax.lax.dot_general(
                e_m.astype(q_all.dtype), jnp.where(mm, v_all, zero), dn_av,
                preferred_element_type=jnp.float32)
            o_h = o_h + e_c * jnp.where(mc, vc_all, zero).astype(jnp.float32)
            o_h = o_h / den
            o = o_h if o is None else o + o_h
        for p in range(pairs):
            sl = slice(p * pw, (p + 1) * pw)
            o_ref[b, :, sl] = o[p].astype(o_ref.dtype)


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
            s = _block_diag_mask_f32(s, block_diag)

        p = _softmax_f32(s).astype(qs.dtype)

        o = jax.lax.dot_general(
            p, vs[...], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [G, N, hd]
        for g in range(group):
            sl = slice(g * head_dim, (g + 1) * head_dim)
            o_ref[b, :, sl] = o[g].astype(o_ref.dtype)


def fused_attention(q, k, v, num_heads: int, group: int | None = None,
                    batch_block: int = 1, block_diag: int = 0,
                    packed: bool | None = None, causal: bool = False,
                    kbias=None, interpret: bool = False):
    """q, k, v: [B, N, D_model] (natural projection layout) ->
    out [B, N, D_model]. Scale (head_dim**-0.5) applied inside.

    `group` = heads per grid step; `batch_block` = images per grid step —
    both amortize grid/DMA overhead (measured best at group 16 for ViT-L
    on v5e — scripts/ablation_probe.py). `block_diag=T` confines attention
    to T-sized blocks along the sequence (packed short-sequence mode).
    `causal` masks above the diagonal inside the kernel; `kbias` is an
    optional [B, 1, N] additive key bias (padding mask) — both serve the
    text tower, whose causal einsum path round-tripped f32 scores through
    HBM. They require the pair-packed kernel (head_dim 64)."""
    import math

    B, N, D = q.shape
    hd = D // num_heads
    group = _select_group(num_heads, hd, N, budget=_fwd_budget(hd, N),
                          cap=16, requested=group, fallback_min=True)
    bb = math.gcd(B, batch_block)
    # Pair-packed kernel whenever heads come in lane-aligned pairs
    # (hd=64 -> 128-lane tiles): no 64-lane relayout copies, full-width
    # MXU contractions. Fall back to the per-head kernel otherwise.
    if packed is None:
        packed = (2 * hd) % 128 == 0 and hd % 128 != 0 and group % 2 == 0
    elif packed and ((2 * hd) % 128 != 0 or group % 2):
        raise ValueError(
            f"packed=True needs pair-packable heads (2*head_dim divisible "
            f"by 128) and an even group; got head_dim={hd}, group={group}")
    if (causal or kbias is not None) and not packed:
        raise ValueError("causal/kbias need the pair-packed kernel")
    if packed:
        kernel = functools.partial(_attn_kernel_packed, pairs=group // 2,
                                   head_dim=hd, scale=hd ** -0.5,
                                   batch_block=bb, block_diag=block_diag,
                                   causal=causal,
                                   has_kbias=kbias is not None)
    else:
        kernel = functools.partial(_attn_kernel, group=group, head_dim=hd,
                                   scale=hd ** -0.5, batch_block=bb,
                                   block_diag=block_diag)
    spec = pl.BlockSpec((bb, N, group * hd), lambda b, h: (b, 0, h),
                        memory_space=pltpu.VMEM)
    scratch_shape = ((group // 2, N, 2 * hd) if packed else (group, N, hd))
    in_specs = [spec, spec, spec]
    inputs = [q, k, v]
    if kbias is not None:
        in_specs.append(pl.BlockSpec((bb, 1, N), lambda b, h: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(kbias)
    return pl.pallas_call(
        kernel,
        grid=(B // bb, num_heads // group),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        scratch_shapes=[pltpu.VMEM(scratch_shape, q.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * N * N * hd,
            bytes_accessed=4 * B * N * D * q.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(*inputs)


def _cls_group(num_heads: int, hd: int, N: int, group: int | None):
    """Head group for the cls-split forward (pair packing mandatory):
    even, lane-aligned, VMEM-bounded, <= 16; explicit groups validated."""
    return _select_group(num_heads, hd, N, budget=_fwd_budget(hd, N),
                         cap=16, requested=group, even_only=True)


def fused_attention_cls(q, k_cls, k_main, v_cls, v_main, num_heads: int,
                        group: int | None = None,
                        batch_block: int | None = None,
                        interpret: bool = False):
    """Forward attention with K/V pre-split into ([B, 1, D] CLS,
    [B, N-1, D] main) so the kernel's score dots run tile-exact when
    N-1 is a lane multiple (ViT: 257 = 1 + 2x128). Callers produce the
    split at the projection level (two matmuls over x[:, :1] / x[:, 1:])
    — no [B, N-1, D] slice copies are ever materialized.

    Default (group, batch_block): the measured optimum at the ViT-L
    shape class this kernel exists for (H=16, hd=64, N=257) is a SMALL
    head group with a DEEP batch block — (2, 16) runs the b64 24-layer
    pass at 9.5 ms vs 11.0 ms for (16, 1): less VMEM per grid step
    pipelines the HBM fetches better (scripts/attn_sweep_probe.py;
    the backward's optimum stays group=8, swept in the same probe)."""
    import math

    B, N, D = q.shape
    nm = k_main.shape[1]
    hd = D // num_heads
    if group is None and batch_block is None:
        try:
            group = _cls_group(num_heads, hd, N, 2)  # validated, not forced
            # _fwd_budget models the score block per head group but
            # assumes one batch row; scale bb down until the bb-scaled
            # q/km/vm/out I/O blocks also fit (double-buffered) next to
            # the scores — at the measured ViT-L shape (N=257) bb=16
            # passes untouched, at larger cls-split shapes this degrades
            # gracefully instead of handing Mosaic an over-VMEM block.
            io_bytes_per_row = 4 * N * group * hd * q.dtype.itemsize
            batch_block = 16
            while batch_block > 1 and (
                    group * N * N * 4 + 2 * batch_block * io_bytes_per_row
                    > 10 * 1024 * 1024):
                batch_block //= 2
        except ValueError:
            group = None  # shape can't take group 2 -> auto selection
    g = _cls_group(num_heads, hd, N, group)
    if g is None:
        raise ValueError("no valid head group for cls-split kernel")
    bb = math.gcd(B, batch_block or 1)
    kernel = functools.partial(_attn_kernel_packed_cls, pairs=g // 2,
                               head_dim=hd, scale=hd ** -0.5, batch_block=bb)
    gw = g * hd
    spec_q = pl.BlockSpec((bb, N, gw), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((bb, nm, gw), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((bb, 1, gw), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    pw = 2 * hd
    return pl.pallas_call(
        kernel,
        grid=(B // bb, num_heads // g),
        in_specs=[spec_q, spec_c, spec_m, spec_c, spec_m],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((g // 2, N, pw), q.dtype),
                        pltpu.VMEM((g // 2, nm, pw), q.dtype),
                        pltpu.VMEM((g // 2, nm, pw), q.dtype),
                        pltpu.VMEM((g // 2, 1, pw), q.dtype),
                        pltpu.VMEM((g // 2, 1, pw), q.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * N * nm * hd,
            bytes_accessed=4 * B * N * D * q.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(q, k_cls, k_main, v_cls, v_main)


def _attn_bwd_kernel_packed_cls(q_ref, kc_ref, km_ref, vc_ref, vm_ref, g_ref,
                                dq_ref, dkc_ref, dkm_ref, dvc_ref, dvm_ref,
                                qs, ks, vs, gs, kcs, vcs, *, pairs: int,
                                head_dim: int, scale: float,
                                batch_block: int = 1):
    """Backward for the cls-split forward: same parity-masked head-pair
    packing as _attn_bwd_kernel_packed, with the CLS column's gradient
    terms computed as VPU reductions/broadcasts — all five MXU dots run
    on the tile-exact 256-key main block. `batch_block` images per grid
    step amortize grid/DMA overhead (the r3 forward retune's lever,
    swept for the backward in round 4 — scripts/attn_sweep_probe.py)."""
    pw = 2 * head_dim
    n = qs.shape[1]
    nm = ks.shape[1]
    lo_q = (jax.lax.broadcasted_iota(jnp.int32, (n, pw), 1) < head_dim)[None]
    lo_m = (jax.lax.broadcasted_iota(jnp.int32, (nm, pw), 1) < head_dim)[None]
    lo_c = (jax.lax.broadcasted_iota(jnp.int32, (1, pw), 1) < head_dim)[None]
    dn_qk = (((2,), (2,)), ((0,), (0,)))   # contract lanes   -> [P, N, Nm]
    dn_av = (((2,), (1,)), ((0,), (0,)))   # contract k-index -> [P, N, pw]
    dn_t = (((1,), (1,)), ((0,), (0,)))    # contract q-index -> [P, Nm, pw]
    for b in range(batch_block):
        for p in range(pairs):
            sl = slice(p * pw, (p + 1) * pw)
            qs[p] = q_ref[b, :, sl]
            ks[p] = km_ref[b, :, sl]
            vs[p] = vm_ref[b, :, sl]
            gs[p] = g_ref[b, :, sl]
            kcs[p] = kc_ref[b, :, sl]
            vcs[p] = vc_ref[b, :, sl]
        q_all, k_all, v_all, g_all = qs[...], ks[...], vs[...], gs[...]
        kc_all, vc_all = kcs[...], vcs[...]
        zero = jnp.zeros((), q_all.dtype)
        dq = dkm = dvm = dkc = dvc = None
        for mq, mm, mc in ((lo_q, lo_m, lo_c), (~lo_q, ~lo_m, ~lo_c)):
            qm = jnp.where(mq, q_all, zero)
            gm = jnp.where(mq, g_all, zero)
            km = jnp.where(mm, k_all, zero)
            kcm = jnp.where(mc, kc_all, zero).astype(jnp.float32)
            vcm = jnp.where(mc, vc_all, zero).astype(jnp.float32)
            s_m = jax.lax.dot_general(
                qm, k_all, dn_qk, preferred_element_type=jnp.float32) * scale
            s_c = jnp.sum(qm.astype(jnp.float32)
                          * kc_all.astype(jnp.float32),
                          axis=2, keepdims=True) * scale
            mx = jnp.maximum(jnp.max(s_m, axis=2, keepdims=True), s_c)
            e_m = jnp.exp(s_m - mx)
            e_c = jnp.exp(s_c - mx)
            den = jnp.sum(e_m, axis=2, keepdims=True) + e_c
            p_m = e_m / den                                 # [P, N, Nm] f32
            p_c = e_c / den                                 # [P, N, 1]  f32
            pb = p_m.astype(q_all.dtype)
            dvm_h = jax.lax.dot_general(pb, gm, dn_t,
                                        preferred_element_type=jnp.float32)
            # CLS-column gradients contract the 257-query axis: run them
            # as [N,1]^T x [N,pw] MXU dots (sublane-axis VPU reductions
            # of a broadcast [N, pw] f32 product measured ~30% slower)
            dvc_h = jax.lax.dot_general(p_c.astype(q_all.dtype), gm, dn_t,
                                        preferred_element_type=jnp.float32)
            dp_m = jax.lax.dot_general(gm, v_all, dn_qk,
                                       preferred_element_type=jnp.float32)
            dp_c = jnp.sum(gm.astype(jnp.float32) * vcm, axis=2,
                           keepdims=True)
            dsum = (jnp.sum(dp_m * p_m, axis=2, keepdims=True)
                    + dp_c * p_c)
            ds_m = (p_m * (dp_m - dsum)).astype(q_all.dtype)
            ds_c = p_c * (dp_c - dsum)                      # [P, N, 1]  f32
            dq_h = (jax.lax.dot_general(ds_m, km, dn_av,
                                        preferred_element_type=jnp.float32)
                    + ds_c * kcm) * scale
            dkm_h = jax.lax.dot_general(
                ds_m, qm, dn_t, preferred_element_type=jnp.float32) * scale
            dkc_h = jax.lax.dot_general(
                ds_c.astype(q_all.dtype), qm, dn_t,
                preferred_element_type=jnp.float32) * scale
            dq = dq_h if dq is None else dq + dq_h
            dkm = dkm_h if dkm is None else dkm + dkm_h
            dvm = dvm_h if dvm is None else dvm + dvm_h
            dkc = dkc_h if dkc is None else dkc + dkc_h
            dvc = dvc_h if dvc is None else dvc + dvc_h
        for p in range(pairs):
            sl = slice(p * pw, (p + 1) * pw)
            dq_ref[b, :, sl] = dq[p].astype(dq_ref.dtype)
            dkm_ref[b, :, sl] = dkm[p].astype(dkm_ref.dtype)
            dvm_ref[b, :, sl] = dvm[p].astype(dvm_ref.dtype)
            dkc_ref[b, :, sl] = dkc[p].astype(dkc_ref.dtype)
            dvc_ref[b, :, sl] = dvc[p].astype(dvc_ref.dtype)


def fused_attention_cls_bwd(q, k_cls, k_main, v_cls, v_main, g,
                            num_heads: int, group: int | None = None,
                            batch_block: int = 1,
                            interpret: bool = False):
    """(dq, dk_cls, dk_main, dv_cls, dv_main) for the cls-split forward."""
    import math

    B, N, D = q.shape
    nm = k_main.shape[1]
    hd = D // num_heads
    group = _select_group(num_heads, hd, N, budget=_bwd_budget(hd, N),
                          cap=8, requested=group, even_only=True)
    if group is None:
        raise ValueError("no valid head group for cls-split backward")
    bb = math.gcd(B, batch_block)
    # eleven I/O blocks scale with bb next to the two f32 score buffers;
    # shrink bb against a ~6 MB I/O budget (mirrors the forward's
    # auto-shrink) instead of letting Mosaic fail the compile
    io_bytes = 11 * N * group * hd * q.dtype.itemsize
    while bb > 1 and bb * io_bytes > 6 * 1024 * 1024:
        bb //= 2
    kernel = functools.partial(_attn_bwd_kernel_packed_cls, pairs=group // 2,
                               head_dim=hd, scale=hd ** -0.5,
                               batch_block=bb)
    gw = group * hd
    pw = 2 * hd
    spec_q = pl.BlockSpec((bb, N, gw), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((bb, nm, gw), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((bb, 1, gw), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    sq = jax.ShapeDtypeStruct((B, N, D), q.dtype)
    sm = jax.ShapeDtypeStruct((B, nm, D), q.dtype)
    sc = jax.ShapeDtypeStruct((B, 1, D), q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B // bb, num_heads // group),
        in_specs=[spec_q, spec_c, spec_m, spec_c, spec_m, spec_q],
        out_specs=[spec_q, spec_c, spec_m, spec_c, spec_m],
        out_shape=[sq, sc, sm, sc, sm],
        scratch_shapes=[pltpu.VMEM((group // 2, N, pw), q.dtype),
                        pltpu.VMEM((group // 2, nm, pw), q.dtype),
                        pltpu.VMEM((group // 2, nm, pw), q.dtype),
                        pltpu.VMEM((group // 2, N, pw), q.dtype),
                        pltpu.VMEM((group // 2, 1, pw), q.dtype),
                        pltpu.VMEM((group // 2, 1, pw), q.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * num_heads * N * nm * hd,
            bytes_accessed=7 * B * N * D * q.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(q, k_cls, k_main, v_cls, v_main, g)


def causal_available(num_heads: int, head_dim: int, seq_len: int) -> bool:
    """Causal/key-bias fusion needs the pair-packed kernel. (Backward is
    the XLA einsum gradient, so only the forward budget gates here.)"""
    return ((2 * head_dim) % 128 == 0 and head_dim % 128 != 0
            and _cls_group(num_heads, head_dim, seq_len, None) is not None)


def cls_split_available(num_heads: int, head_dim: int, seq_len: int) -> bool:
    """The cls-split kernels apply when the non-CLS token count is an exact
    lane multiple and heads pack in 128-lane pairs (ViT-L/14: 257, hd 64).

    Gates on BOTH the forward and the (stricter, 2-score-block) backward
    budgets: ops.attention routes fwd AND bwd through the cls pair as one
    custom-VJP unit, so a forward-only fit would compile, run eval fine,
    and then die in the first training step's backward."""
    return ((seq_len - 1) % 128 == 0 and seq_len > 128
            and (2 * head_dim) % 128 == 0 and head_dim % 128 != 0
            and num_heads % 2 == 0
            and _cls_group(num_heads, head_dim, seq_len, None) is not None
            and _select_group(num_heads, head_dim, seq_len,
                              budget=_bwd_budget(head_dim, seq_len),
                              cap=8, even_only=True) is not None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention_cls_ad(q, k_cls, k_main, v_cls, v_main, num_heads: int):
    return fused_attention_cls(q, k_cls, k_main, v_cls, v_main, num_heads)


def _fac_fwd(q, k_cls, k_main, v_cls, v_main, num_heads):
    return (fused_attention_cls(q, k_cls, k_main, v_cls, v_main, num_heads),
            (q, k_cls, k_main, v_cls, v_main))


def _fac_bwd(num_heads, res, g):
    q, k_cls, k_main, v_cls, v_main = res
    if jax.default_backend() == "tpu":
        return tuple(fused_attention_cls_bwd(q, k_cls, k_main, v_cls, v_main,
                                             g, num_heads))
    k = jnp.concatenate([k_cls, k_main], axis=1)
    v = jnp.concatenate([v_cls, v_main], axis=1)
    dq, dk, dv = _einsum_bwd(num_heads, 0, (q, k, v), g)
    return dq, dk[:, :1], dk[:, 1:], dv[:, :1], dv[:, 1:]


fused_attention_cls_ad.defvjp(_fac_fwd, _fac_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention_causal_ad(q, k, v, kbias, num_heads: int):
    """Causal attention with an additive key bias [B, 1, N] (padding mask),
    fused in VMEM — the text tower's path. Backward falls back to the XLA
    einsum gradient (the text tower is frozen in the reference's training
    recipe, so its attention backward is never hot — SURVEY §2 row 5g:
    LoRA targets the vision encoder only)."""
    return fused_attention(q, k, v, num_heads, causal=True, kbias=kbias)


def _fca_fwd(q, k, v, kbias, num_heads):
    return fused_attention_causal_ad(q, k, v, kbias, num_heads), (q, k, v,
                                                                  kbias)


def _fca_bwd(num_heads, res, g):
    q, k, v, kbias = res
    N = q.shape[1]
    bias = _causal_dense_bias(N) + kbias[:, :, None, :].astype(jnp.float32)
    dq, dk, dv, ds = _einsum_bwd_bias(num_heads, bias, (q, k, v), g,
                                      want_ds=True)
    # d(additive key bias) = sum of the score cotangent over heads and
    # queries (the bias broadcasts over both). Callers that pass a pure
    # -inf/0 padding mask get a finite but unused gradient; callers that
    # learn a bias get the true one.
    dkbias = jnp.sum(ds, axis=(1, 2))[:, None, :].astype(kbias.dtype)
    return dq, dk, dv, dkbias


fused_attention_causal_ad.defvjp(_fca_fwd, _fca_bwd)


def _causal_dense_bias(n: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(c <= r, 0.0, jnp.finfo(jnp.float32).min)[None, None]


def _attn_bwd_kernel_packed(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref,
                            dv_ref, qs, ks, vs, gs, *, pairs: int,
                            head_dim: int, scale: float, block_diag: int = 0):
    """Head-pair-packed backward (see _attn_kernel_packed): lane-aligned
    128-wide staging, per-head separation by zero-masking one operand of
    each dot. Masking rules per quantity (head h of a pair):
      s_h   = dot(q masked to h, k_full)        — zeros kill the other head
      dp_h  = dot(g masked to h, v_full)
      dv_h  = dot(p_h^T, g masked to h)         — other head's lanes -> 0
      dq_h  = dot(ds_h, k masked to h)          — ditto
      dk_h  = dot(ds_h^T, q masked to h)
    and each pair's two results sum into one aligned 128-lane write."""
    pw = 2 * head_dim
    n = qs.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, pw), 1)
    lo_m = (lane < head_dim)[None]
    for p in range(pairs):
        sl = slice(p * pw, (p + 1) * pw)
        qs[p] = q_ref[0, :, sl]
        ks[p] = k_ref[0, :, sl]
        vs[p] = v_ref[0, :, sl]
        gs[p] = g_ref[0, :, sl]

    q_all, k_all, v_all, g_all = qs[...], ks[...], vs[...], gs[...]
    zero = jnp.zeros((), q_all.dtype)
    dn_qk = (((2,), (2,)), ((0,), (0,)))   # contract lanes      -> [P, N, N]
    dn_av = (((2,), (1,)), ((0,), (0,)))   # contract k-index    -> [P, N, pw]
    dn_t = (((1,), (1,)), ((0,), (0,)))    # contract q-index    -> [P, N, pw]

    dq = dk = dv = None
    for mask in (lo_m, ~lo_m):
        qm = jnp.where(mask, q_all, zero)
        km = jnp.where(mask, k_all, zero)
        gm = jnp.where(mask, g_all, zero)
        s = jax.lax.dot_general(qm, k_all, dn_qk,
                                preferred_element_type=jnp.float32) * scale
        if block_diag:
            s = _block_diag_mask_f32(s, block_diag)
        prob = _softmax_f32(s)                             # [P, N, N] f32
        pb = prob.astype(q_all.dtype)
        dv_h = jax.lax.dot_general(pb, gm, dn_t,
                                   preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(gm, v_all, dn_qk,
                                 preferred_element_type=jnp.float32)
        ds = (prob * (dp - jnp.sum(dp * prob, axis=2, keepdims=True))
              ).astype(q_all.dtype)
        dq_h = jax.lax.dot_general(ds, km, dn_av,
                                   preferred_element_type=jnp.float32) * scale
        dk_h = jax.lax.dot_general(ds, qm, dn_t,
                                   preferred_element_type=jnp.float32) * scale
        dq = dq_h if dq is None else dq + dq_h
        dk = dk_h if dk is None else dk + dk_h
        dv = dv_h if dv is None else dv + dv_h

    for p in range(pairs):
        sl = slice(p * pw, (p + 1) * pw)
        dq_ref[0, :, sl] = dq[p].astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk[p].astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv[p].astype(dv_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                     qs, ks, vs, gs, *, group: int, head_dim: int,
                     scale: float, block_diag: int = 0):
    """One (batch, head-group) grid step: recompute P from q/k in VMEM,
    then the standard attention gradient — 5 G-batched dots, everything
    resident in VMEM (no [N, N] HBM traffic)."""
    for g in range(group):
        sl = slice(g * head_dim, (g + 1) * head_dim)
        qs[g] = q_ref[0, :, sl]
        ks[g] = k_ref[0, :, sl]
        vs[g] = v_ref[0, :, sl]
        gs[g] = g_ref[0, :, sl]

    s = jax.lax.dot_general(
        qs[...], ks[...], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale       # [G, N, N] f32
    if block_diag:
        s = _block_diag_mask_f32(s, block_diag)
    p = _softmax_f32(s)                                   # [G, N, N] f32
    pb = p.astype(qs.dtype)

    # dv[k,d] = sum_q P[q,k] g[q,d]
    dv = jax.lax.dot_general(
        pb, gs[...], dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # [G, N, hd]
    # dP[q,k] = g[q,d] v[k,d]
    dp = jax.lax.dot_general(
        gs[...], vs[...], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # [G, N, N]
    ds = (p * (dp - jnp.sum(dp * p, axis=2, keepdims=True))).astype(qs.dtype)
    # dq[q,d] = dS[q,k] k[k,d] * scale ; dk[k,d] = dS[q,k] q[q,d] * scale
    dq = jax.lax.dot_general(
        ds, ks[...], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, qs[...], dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale

    for g in range(group):
        sl = slice(g * head_dim, (g + 1) * head_dim)
        dq_ref[0, :, sl] = dq[g].astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk[g].astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv[g].astype(dv_ref.dtype)


def fused_attention_bwd(q, k, v, g, num_heads: int, block_diag: int = 0,
                        group: int | None = None, packed: bool | None = None,
                        interpret: bool = False):
    """(dq, dk, dv) for the fused forward, all-VMEM. Group selection is
    stricter than forward: two f32 [G, N, N] live values (P and dP) plus
    seven I/O blocks must fit."""
    B, N, D = q.shape
    hd = D // num_heads
    # cap 8 at large N (two f32 [G,N,N] live values reward it); the
    # block-diag (packed temporal) shape's small score matrices amortize
    # wider — swept r4: group 16 24.35 ms vs 8 27.67 at N=128 bd=8
    # (scripts/attn_sweep_probe2.py 'bwd')
    cap = 16 if block_diag else 8
    group = _select_group(num_heads, hd, N, budget=_bwd_budget(hd, N),
                          cap=cap, requested=group, fallback_min=True)

    if packed is None:
        packed = (2 * hd) % 128 == 0 and hd % 128 != 0 and group % 2 == 0
    elif packed and ((2 * hd) % 128 != 0 or group % 2):
        raise ValueError(
            f"packed=True needs pair-packable heads (2*head_dim divisible "
            f"by 128) and an even group; got head_dim={hd}, group={group}")
    if packed:
        kernel = functools.partial(_attn_bwd_kernel_packed,
                                   pairs=group // 2, head_dim=hd,
                                   scale=hd ** -0.5, block_diag=block_diag)
        scratch_shape = (group // 2, N, 2 * hd)
    else:
        kernel = functools.partial(_attn_bwd_kernel, group=group,
                                   head_dim=hd, scale=hd ** -0.5,
                                   block_diag=block_diag)
        scratch_shape = (group, N, hd)
    spec = pl.BlockSpec((1, N, group * hd), lambda b, h: (b, 0, h),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, N, D), q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, num_heads // group),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[shape] * 3,
        scratch_shapes=[pltpu.VMEM(scratch_shape, q.dtype)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * num_heads * N * N * hd,
            bytes_accessed=7 * B * N * D * q.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(q, k, v, g)


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
    if jax.default_backend() == "tpu":
        return tuple(fused_attention_bwd(q, k, v, g, num_heads,
                                         block_diag=block_diag))
    return _einsum_bwd(num_heads, block_diag, res, g)


def _einsum_bwd(num_heads, block_diag, res, g):
    bias = (_block_diag_bias(res[0].shape[1], block_diag)[None, None]
            if block_diag else None)
    return _einsum_bwd_bias(num_heads, bias, res, g)


def _einsum_bwd_bias(num_heads, bias, res, g, want_ds: bool = False):
    q, k, v = res
    B, N, D = q.shape
    hd = D // num_heads
    scale = hd ** -0.5
    qh = q.reshape(B, N, num_heads, hd).astype(jnp.float32)
    kh = k.reshape(B, N, num_heads, hd).astype(jnp.float32)
    vh = v.reshape(B, N, num_heads, hd).astype(jnp.float32)
    gh = g.reshape(B, N, num_heads, hd).astype(jnp.float32)

    s = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh)
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gh)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gh, vh)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kh) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qh) * scale
    out = (dq.reshape(B, N, D).astype(q.dtype),
           dk.reshape(B, N, D).astype(k.dtype),
           dv.reshape(B, N, D).astype(v.dtype))
    return out + (ds,) if want_ds else out


fused_attention_ad.defvjp(_fa_fwd, _fa_bwd)
