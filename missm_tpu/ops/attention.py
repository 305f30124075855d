"""Multi-head attention.

Numerics match HF `CLIPAttention` (the reference towers import it directly at
image/modeling_image.py:11): q scaled by head_dim**-0.5, softmax in f32,
additive bias masks. Formulated as batched einsums so XLA tiles the (B*H)
batched matmuls onto the MXU; the `model` mesh axis can shard the head
dimension of the projection weights for tensor parallelism.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .basic import linear


def _named(t, name):
    """checkpoint_name shim: a no-op outside jax.checkpoint or under remat
    policies that don't save `name`."""
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(t, name)


def _qkv(t, name="qkv"):
    """Tag a q/k/v projection output for the 'save_attn_mlp_qkv' remat
    policy (models.tower): saving these lets the backward feed the
    attention-kernel VJP directly instead of replaying ln1 + the qkv
    matmuls (~103 GFLOP/layer at 64 ViT-L instances). Temporal attention
    tags 'tqkv' instead (see short_attention) so policies can save the
    spatial qkv without also paying for the temporal one — that holds on
    EVERY path, including the einsum fallback (qkv_tag below)."""
    return _named(t, name)


def _tqkv(t):
    """Temporal-attention q/k/v tag (see short_attention): a distinct name
    so remat policies can save the spatial qkv without also paying for the
    temporal one."""
    return _named(t, "tqkv")


def multi_head_attention(params, x, *, num_heads: int, bias=None,
                         causal: bool = False, key_bias=None,
                         lora_scaling: float | None = None,
                         qkv_tag: str = "qkv",
                         kern_tag: str = "attn_kernel_out"):
    """Self-attention over x: [B, N, D] -> [B, N, D].

    bias: optional additive attention bias broadcastable to [B, H, N, N].
    causal/key_bias: structured masks (the text tower's causal mask and
    [B, 1, N] padding bias) — kept separate from `bias` so the TPU path
    can apply them INSIDE the fused kernel instead of falling back to the
    einsum formulation, whose f32 [B, H, N, N] scores round-trip HBM.

    Bias-free and causal attention on TPU route through the fused Pallas
    kernel (kernels.flash_attention): the [N, N] score matrix stays in
    VMEM. Dense-`bias` attention stays on XLA einsums.
    """
    B, N, D = x.shape
    H = num_heads
    hd = D // H
    scale = hd ** -0.5

    q = _qkv(linear(params["q"], x, lora_scaling=lora_scaling), qkv_tag)

    if bias is None and (causal or key_bias is not None) and _fused_ok(hd, N):
        from ..kernels.flash_attention import (causal_available,
                                               fused_attention_causal_ad)
        if causal and causal_available(H, hd, N):
            k = _qkv(linear(params["k"], x, lora_scaling=lora_scaling),
                     qkv_tag)
            v = _qkv(linear(params["v"], x, lora_scaling=lora_scaling),
                     qkv_tag)
            kb = (key_bias if key_bias is not None
                  else jnp.zeros((B, 1, N), jnp.float32))
            out = fused_attention_causal_ad(q, k, v, kb, H)
            return linear(params["out"], out, lora_scaling=lora_scaling)

    if bias is None and not causal and key_bias is None and _fused_ok(hd, N):
        from ..kernels.flash_attention import (cls_split_available,
                                               fused_attention_ad,
                                               fused_attention_cls_ad)
        if cls_split_available(H, hd, N):
            # CLS-split: k/v projections run as two matmuls over
            # x[:, :1] / x[:, 1:] (same FLOPs, no slice copies), so the
            # kernel's score dots see an exact-lane 256-key block and the
            # single CLS column folds in on the VPU — removes the
            # 257->384 lane-tile padding (~1.5x MXU waste, docs/PERF.md)
            k_cls = _qkv(linear(params["k"], x[:, :1],
                                lora_scaling=lora_scaling), qkv_tag)
            k_main = _qkv(linear(params["k"], x[:, 1:],
                                 lora_scaling=lora_scaling), qkv_tag)
            v_cls = _qkv(linear(params["v"], x[:, :1],
                                lora_scaling=lora_scaling), qkv_tag)
            v_main = _qkv(linear(params["v"], x[:, 1:],
                                 lora_scaling=lora_scaling), qkv_tag)
            out = fused_attention_cls_ad(q, k_cls, k_main, v_cls, v_main, H)
        else:
            # fused kernel consumes/produces the natural [B, N, D] layout —
            # no head transposes materialize
            k = _qkv(linear(params["k"], x, lora_scaling=lora_scaling),
                     qkv_tag)
            v = _qkv(linear(params["v"], x, lora_scaling=lora_scaling),
                     qkv_tag)
            out = fused_attention_ad(q, k, v, H)
    else:
        if causal:
            cb = causal_bias(N, dtype=jnp.float32)
            bias = cb if bias is None else bias + cb
        if key_bias is not None:
            kb = key_bias[:, :, None, :].astype(jnp.float32)  # [B, 1, 1, N]
            bias = kb if bias is None else bias + kb
        k = linear(params["k"], x, lora_scaling=lora_scaling)
        v = linear(params["v"], x, lora_scaling=lora_scaling)
        qh = q.reshape(B, N, H, hd)
        kh = k.reshape(B, N, H, hd)
        vh = v.reshape(B, N, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(B, N, D)
    # Named so the `save_attn_mlp_kern` remat policy can keep it: when the
    # out projection carries LoRA, its da/db need this value as input — the
    # only backward consumer that otherwise forces a replay of the forward
    # attention kernel during rematerialized backprop. (kern_tag is
    # 'tattn_kernel_out' on the temporal fallback path.)
    from jax.ad_checkpoint import checkpoint_name
    out = checkpoint_name(out, kern_tag)
    return linear(params["out"], out, lora_scaling=lora_scaling)


def short_attention(params, x, *, num_heads: int,
                    lora_scaling: float | None = None, pack_to: int = 128):
    """Self-attention over [M, T, D] with tiny T (the temporal axis —
    T <= 8 frames). Tiny instances map terribly onto the 128x128 MXU
    (~1.6% tile utilization), so on TPU `pack_to // T` instances are packed
    into one 128-token sequence and attention is confined to each instance
    with a block-diagonal mask inside the fused kernel — 100% tile
    utilization at 16x redundant (masked) score FLOPs, a large net win.
    Falls back to the einsum path elsewhere."""
    M, T, D = x.shape
    hd = D // num_heads
    if (not _fused_ok(hd, pack_to) or T >= pack_to or pack_to % T != 0
            or M < pack_to // T):
        # qkv_tag='tqkv': the fallback must keep the temporal tag too, or
        # shapes that miss the packed path (T not dividing pack_to,
        # hd % 64 != 0) would silently re-save temporal qkv under
        # save_attn_mlp_qkv — the doubled footprint the split prevents
        return multi_head_attention(params, x, num_heads=num_heads,
                                    lora_scaling=lora_scaling,
                                    qkv_tag="tqkv",
                                    kern_tag="tattn_kernel_out")

    # Tagged 'tqkv', NOT 'qkv': the save_attn_mlp_qkv remat policy saves
    # spatial/sequence qkv only. Saving the temporal qkv too doubles the
    # policy's footprint at video shapes (temporal tokens B*N*T == spatial
    # tokens B*T*N) and pushed the B=8 video tower out of HBM; the spatial
    # stack is where the replay savings are (docs/PERF.md train3 sweep).
    q = _tqkv(linear(params["q"], x, lora_scaling=lora_scaling))
    k = _tqkv(linear(params["k"], x, lora_scaling=lora_scaling))
    v = _tqkv(linear(params["v"], x, lora_scaling=lora_scaling))

    pack = pack_to // T
    full = (M // pack) * pack

    from ..kernels.flash_attention import _einsum_reference, fused_attention_ad

    def packed(t):
        return t[:full].reshape(full // pack, pack * T, D)

    out = fused_attention_ad(packed(q), packed(k), packed(v), num_heads, T)
    out = out.reshape(full, T, D)
    if full != M:
        # Remainder instances (< pack) run on the einsum path: padding M up
        # to a pack multiple instead would jnp.pad each of q/k/v — three
        # full-tensor HBM copies per call — while the tail is at most 15
        # tiny T-token instances.
        tail = _einsum_reference(q[full:], k[full:], v[full:], num_heads)
        out = jnp.concatenate([out, tail], axis=0)
    # 'tattn_kernel_out', distinct from the spatial 'attn_kernel_out':
    # the video tower's LoRA sits on the TEMPORAL out projection, whose
    # da/db need this value — save_attn_mlp_qkv_tkern keeps it (skipping
    # the temporal-kernel replay) without also saving the spatial kernel
    # outputs, which measured as a regression at video instance counts
    from jax.ad_checkpoint import checkpoint_name
    out = checkpoint_name(out, "tattn_kernel_out")
    return linear(params["out"], out, lora_scaling=lora_scaling)


def _fused_ok(head_dim: int, seq_len: int) -> bool:
    if head_dim % 64 != 0:
        return False
    # short sequences (temporal attention over T<=8 frames runs on a
    # [B*tokens, T, D] layout) would explode the kernel grid into tens of
    # thousands of tiny steps — XLA's einsum is the right tool there
    if seq_len < 64:
        return False
    import jax as _jax
    return _jax.default_backend() == "tpu"


def causal_bias(n: int, dtype=jnp.float32):
    """Additive causal mask: 0 on/below diagonal, large-negative above.

    Matches `_make_causal_mask` (reference image/modeling_image.py:441-455),
    which fills with finfo.min.
    """
    neg = jnp.finfo(dtype).min
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(j <= i, 0.0, neg).astype(dtype)[None, None, :, :]


def key_padding_bias(pad_mask, dtype=jnp.float32):
    """[B, N] boolean (True = masked/missing) -> additive bias [B,1,1,N]."""
    neg = jnp.finfo(dtype).min
    return jnp.where(pad_mask[:, None, None, :], neg, 0.0).astype(dtype)
