"""Fused LayerNorm -> matmul Pallas kernel (the pre-LN block's ln2->fc1
boundary).

Why: docs/PERF.md round-3 attributes ~5 ms of the b64 eval step to
"LN/elementwise HBM traffic between the fused regions". XLA keeps the
normalized activation `hn = LN(h)` as a materialized [M, D] buffer
between the LN fusion and the consuming matmul — one full write + read
of the activation per boundary per layer. This kernel reads the RAW
activation block once, computes the row statistics in VMEM, normalizes
in-register, and feeds the MXU directly: the normalized copy never
exists in HBM.

Saved traffic per fused boundary per layer (b64 ViT-L, [16448, 1024]
bf16 = 33.7 MB): the hn write + read = 67 MB, ~1.6 GB/step over 24
layers => ~2 ms at the 819 GB/s HBM roofline. Measured effect in
scripts/ln_linear_probe.py.

Grid: (M/bm, F/bf) row-major; per step the kernel renormalizes the
[bm, D] x-block (stats recomputed per F-block — a VPU reduction over
rows already resident, ~free) and dots it with the [D, bf] weight block.

The VJP keeps the backward on XLA: dy @ w^T -> LayerNorm backward is
the same op chain XLA autodiff produces for the unfused graph (one
materialized xn for the frozen-dead dw is avoided because dw is only
emitted when w is actually differentiated — frozen towers never ask).
Residuals are (x, w, gamma, beta): the row stats are recomputed in the
backward's elementwise chain, which XLA fuses.

Reference: the pre-LN CLIPEncoderLayer structure this serves,
/root/reference/languagebind/image/modeling_image.py:136-151.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Trace-time switch for the ln2->fc1 fusion in models.tower._block_forward.
# OFF by default per the measured-neutral receipt (scripts/
# ln_linear_probe.py: 67.76 vs 67.74 ms/stack — XLA already fuses the
# boundary); the probe flips it per arm so the receipt stays
# reproducible against the production block.
FUSE_LN2_FC1 = False


def _ln_linear_kernel(x_ref, g_ref, b_ref, w_ref, o_ref, *, eps: float,
                      has_bias: bool, wb_ref=None):
    xf = x_ref[...].astype(jnp.float32)                 # [bm, D]
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y = jax.lax.dot_general(
        xn.astype(x_ref.dtype), w_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    if has_bias:
        y = y + wb_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_linear_fwd_pallas(x, gamma, beta, w, wb, *, eps: float,
                          block_m: int, block_f: int,
                          interpret: bool = False):
    M, D = x.shape
    F = w.shape[1]
    bm = min(block_m, M)
    while M % bm:
        bm //= 2
    bf = min(block_f, F)
    while F % bf:
        bf //= 2
    has_bias = wb is not None
    kernel = (functools.partial(_ln_linear_kernel_b, eps=eps) if has_bias
              else functools.partial(_ln_linear_kernel, eps=eps,
                                     has_bias=False))
    in_specs = [
        pl.BlockSpec((bm, D), lambda m, f: (m, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((D,), lambda m, f: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((D,), lambda m, f: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, bf), lambda m, f: (0, f),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, gamma, beta, w]
    if has_bias:
        in_specs.append(pl.BlockSpec((bf,), lambda m, f: (f,),
                                     memory_space=pltpu.VMEM))
        args.append(wb)
    return pl.pallas_call(
        kernel,
        grid=(M // bm, F // bf),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bf), lambda m, f: (m, f),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, F), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * D * F,
            bytes_accessed=(M * D + D * F + M * F) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _ln_linear_kernel_b(x_ref, g_ref, b_ref, w_ref, wb_ref, o_ref, *,
                        eps: float):
    _ln_linear_kernel(x_ref, g_ref, b_ref, w_ref, o_ref, eps=eps,
                      has_bias=True, wb_ref=wb_ref)


def _ln_ref(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return xn, (xn * gamma + beta).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _ln_linear(x, gamma, beta, w, wb, eps, block_m, block_f, interpret):
    return _ln_linear_fwd_pallas(x, gamma, beta, w, wb, eps=eps,
                                 block_m=block_m, block_f=block_f,
                                 interpret=interpret)


def _ln_linear_fwd(x, gamma, beta, w, wb, eps, block_m, block_f, interpret):
    y = _ln_linear_fwd_pallas(x, gamma, beta, w, wb, eps=eps,
                              block_m=block_m, block_f=block_f,
                              interpret=interpret)
    return y, (x, gamma, beta, w, wb is not None)


def _ln_linear_bwd(eps, block_m, block_f, interpret, res, dy):
    x, gamma, beta, w, has_bias = res
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd

    dyc = dy.astype(x.dtype)
    dln = jnp.dot(dyc, w.T,
                  preferred_element_type=jnp.float32)      # [M, D] f32
    dw = jnp.dot((xhat * gamma + beta).astype(x.dtype).T, dyc,
                 preferred_element_type=jnp.float32).astype(w.dtype)
    dwb = (jnp.sum(dy.astype(jnp.float32), axis=0).astype(w.dtype)
           if has_bias else None)
    dgamma = jnp.sum(dln * xhat, axis=0).astype(gamma.dtype)
    dbeta = jnp.sum(dln, axis=0).astype(beta.dtype)
    t = dln * gamma
    dx = rstd * (t - jnp.mean(t, axis=-1, keepdims=True)
                 - xhat * jnp.mean(t * xhat, axis=-1, keepdims=True))
    return dx.astype(x.dtype), dgamma, dbeta, dw, dwb


_ln_linear.defvjp(_ln_linear_fwd, _ln_linear_bwd)


def ln_linear(x, ln_params, lin_params, *, eps: float = 1e-5,
              block_m: int = 512, block_f: int = 2048,
              interpret: bool = False):
    """y = LN(x; ln_params) @ lin_params['w'] (+ lin_params['b']).

    x: [..., D] (leading dims flattened for the kernel); returns
    [..., F]. Numerics match ops.basic.layer_norm -> ops.basic.linear
    (f32 stats, f32 dot accumulation). No LoRA support — use the unfused
    path for LoRA'd projections (the fold's exact-rank VJP lives there).
    """
    orig = x.shape
    D = orig[-1]
    w = lin_params["w"]
    wb = lin_params.get("b")
    x2 = x.reshape(-1, D)
    y = _ln_linear(x2, ln_params["scale"], ln_params["bias"], w, wb,
                   eps, block_m, block_f, interpret)
    return y.reshape(orig[:-1] + (w.shape[1],))


def ln_linear_available(x, lin_params) -> bool:
    """TPU-only; lane-aligned shapes (D and F multiples of 128) keep the
    kernel's blocks tile-exact. Everything else uses the unfused path."""
    if jax.default_backend() != "tpu":
        return False
    if "lora_a" in lin_params:
        return False
    D = x.shape[-1]
    F = lin_params["w"].shape[1]
    M = 1
    for s in x.shape[:-1]:
        M *= s
    return D % 128 == 0 and F % 128 == 0 and M % 8 == 0
