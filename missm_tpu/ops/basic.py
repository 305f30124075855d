"""Elementwise / dense primitives shared by all towers and fusion heads.

All functions are pure and jit-safe. Matmuls go through `linear`, which
requests f32 accumulation (`preferred_element_type`) so bf16 params still
accumulate at full precision on the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x) (HF 'quick_gelu')."""
    return x * jax.nn.sigmoid(1.702 * x)


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


def linear(params, x, *, lora_scaling: float | None = None):
    """y = x @ w (+ b) with optional merged-at-apply-time LoRA delta.

    `params['w']`: (in, out). Optional `params['b']`: (out,).
    Optional `params['lora_a']`: (in, r), `params['lora_b']`: (r, out) —
    mirrors peft's LoRA on the reference's vision attention (reference
    image/modeling_image.py:775-793; lora_dropout defaults to 0, so the
    adapter is the pure linear delta `x @ a @ b * scaling`).

    The delta is FOLDED into the weight (w + a @ b * scaling) rather than
    applied as `(x @ a) @ b`: rank-r (r=2) per-token matmuls pad their
    2-wide axis to full MXU tiles — measured ~9 ms of the ViT-L b64 step —
    while the fold is one [in, r] x [r, out] dot per layer per step (peft's
    own merge_and_unload math). Gradients are unchanged in structure:
    da = dw_eff @ b^T, db = a^T @ dw_eff, and at init (b == 0) the folded
    weight equals the base weight bit-for-bit.
    """
    w = params["w"]
    if lora_scaling is not None and "lora_a" in params:
        delta = jnp.dot(params["lora_a"], params["lora_b"],
                        preferred_element_type=jnp.float32)
        w = (w.astype(jnp.float32) + delta * lora_scaling).astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
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
