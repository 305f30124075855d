"""Elementwise / dense primitives shared by all towers and fusion heads.

All functions are pure and jit-safe. Matmuls go through `linear`, which
requests f32 accumulation (`preferred_element_type`) so bf16 params still
accumulate at full precision on the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x) (HF 'quick_gelu').

    The sigmoid is checkpoint-named 'act_sig': the derivative needs it
    again in the backward, and the 'save_attn_mlp_qkv_sig' remat policy
    can keep it instead of recomputing the transcendental (a no-op tag
    outside jax.checkpoint)."""
    from jax.ad_checkpoint import checkpoint_name
    s = checkpoint_name(jax.nn.sigmoid(1.702 * x), "act_sig")
    return x * s


_ACTS = {
    "quick_gelu": quick_gelu,
    "gelu": jax.nn.gelu,
    "relu": jax.nn.relu,
}


def get_activation(name: str):
    return _ACTS[name]


def layer_norm(params, x, eps: float = 1e-5):
    """LayerNorm over the last axis; statistics in f32 regardless of x dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(x.dtype)


def _fold_lora(w, a, b, scaling, out_dtype):
    """peft merge_and_unload math: w + a @ b * scaling, folded in f32.

    In bf16 compute mode the cast of the merged weight rounds per-element
    deltas below ~2^-8 of |w| away in the forward (unlike an unfused f32
    `x @ a @ b` delta). Accepted: the reference trains the adapter in the
    checkpoint dtype too, and the exact-rank gradients below do not pass
    through this rounding.
    """
    delta = jnp.dot(a, b, preferred_element_type=jnp.float32)
    return (w.astype(jnp.float32) + delta * scaling).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lora_matmul(scaling, x, w, a, b):
    """x @ (w + a @ b * scaling) with exact-rank LoRA gradients.

    Forward uses the folded weight (one [in, r] x [r, out] dot per call —
    rank-r per-token matmuls pad their r=2 axis to full MXU tiles, measured
    ~11 ms of the ViT-L b64 eval step). Plain autodiff of the fold, though,
    routes da/db through dW_eff = x^T @ dy — a full [in, out] matmul per
    projection per step (~17 ms of the b64 train step) that exists ONLY to
    be immediately collapsed to rank r. This VJP computes the
    mathematically identical gradients at rank r directly:
        da = x^T @ (dy @ b^T) * scaling      (two [*, r] dots)
        db = (x @ a)^T @ dy * scaling
        dw = x^T @ dy  (the true base-weight cotangent — emitted so full
             fine-tuning stays correct, dead-code-eliminated by XLA when
             the base is frozen out of the differentiated partition)
        dx = dy @ w_eff^T  (fold recomputed, rank-r cost)
    """
    return jnp.dot(x, _fold_lora(w, a, b, scaling, x.dtype),
                   preferred_element_type=jnp.float32)


def _lora_matmul_fwd(scaling, x, w, a, b):
    return _lora_matmul(scaling, x, w, a, b), (x, w, a, b)


def _lora_matmul_bwd(scaling, res, g):
    x, w, a, b = res
    gc = g.astype(x.dtype)
    w_eff = _fold_lora(w, a, b, scaling, x.dtype)
    dx = jnp.dot(gc, w_eff.T,
                 preferred_element_type=jnp.float32).astype(x.dtype)
    x2 = x.reshape(-1, x.shape[-1])
    g2 = gc.reshape(-1, gc.shape[-1])
    dw = jnp.dot(x2.T, g2,
                 preferred_element_type=jnp.float32).astype(w.dtype)
    gb = jnp.dot(g2, b.T.astype(g2.dtype),
                 preferred_element_type=jnp.float32)        # [N, r]
    da = (jnp.dot(x2.T, gb.astype(x2.dtype),
                  preferred_element_type=jnp.float32)
          * scaling).astype(a.dtype)
    xa = jnp.dot(x2, a, preferred_element_type=jnp.float32)  # [N, r]
    db = (jnp.dot(xa.astype(g2.dtype).T, g2,
                  preferred_element_type=jnp.float32)
          * scaling).astype(b.dtype)
    return dx, dw, da, db


_lora_matmul.defvjp(_lora_matmul_fwd, _lora_matmul_bwd)


def linear(params, x, *, lora_scaling: float | None = None):
    """y = x @ w (+ b) with optional merged-at-apply-time LoRA delta.

    `params['w']`: (in, out). Optional `params['b']`: (out,).
    Optional `params['lora_a']`: (in, r), `params['lora_b']`: (r, out) —
    mirrors peft's LoRA on the reference's vision attention (reference
    image/modeling_image.py:775-793; lora_dropout defaults to 0, so the
    adapter is the pure linear delta `x @ a @ b * scaling`). At init
    (b == 0) the folded weight equals the base weight bit-for-bit.

    LoRA'd projections route through `_lora_matmul`, whose custom VJP
    keeps the folded-weight forward while producing the adapter gradients
    at rank r instead of through a full [in, out] dW_eff matmul.
    """
    if lora_scaling is not None and "lora_a" in params:
        y = _lora_matmul(lora_scaling, x, params["w"], params["lora_a"],
                         params["lora_b"])
    else:
        y = jnp.dot(x, params["w"], preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"]
    return y.astype(x.dtype)


def l2_normalize(x, axis=-1, eps: float = 0.0):
    """x / ||x||_2 — matches torch `x / x.norm(p=2, dim=-1, keepdim=True)`
    (reference languagebind/__init__.py:80): no epsilon."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)
    return x / n


def dropout(key, x, rate: float, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
