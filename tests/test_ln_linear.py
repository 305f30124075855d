"""Fused LN->matmul kernel (kernels.ln_linear) vs the unfused
layer_norm -> linear composition: forward parity (interpret mode on
CPU), full gradient parity through the custom VJP, and the
availability gate."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.kernels.ln_linear import (_ln_linear, ln_linear,
                                         ln_linear_available)
from missm_tpu.ops.basic import layer_norm, linear

M, D, F = 64, 256, 512
EPS = 1e-5


@pytest.fixture(scope="module")
def tensors():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, D)), jnp.float32)
    ln = {"scale": jnp.asarray(rng.standard_normal(D), jnp.float32),
          "bias": jnp.asarray(rng.standard_normal(D), jnp.float32)}
    lin = {"w": jnp.asarray(rng.standard_normal((D, F)) * 0.05,
                            jnp.float32),
           "b": jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)}
    return x, ln, lin


def _ref(x, ln, lin):
    return linear(lin, layer_norm(ln, x, EPS))


def test_fwd_parity(tensors):
    x, ln, lin = tensors
    y = ln_linear(x, ln, lin, eps=EPS, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(x, ln, lin)),
                               atol=1e-4, rtol=1e-5)


def test_fwd_parity_no_bias(tensors):
    x, ln, lin = tensors
    lin2 = {"w": lin["w"]}
    y = ln_linear(x, ln, lin2, eps=EPS, interpret=True)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_ref(x, ln, lin2)),
                               atol=1e-4, rtol=1e-5)


def test_fwd_parity_3d_bf16(tensors):
    x, ln, lin = tensors
    x3 = x.reshape(4, M // 4, D).astype(jnp.bfloat16)
    lnb = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), ln)
    linb = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), lin)
    y = ln_linear(x3, lnb, linb, eps=EPS, interpret=True)
    ref = _ref(x3, lnb, linb)
    assert y.shape == (4, M // 4, F) and y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_grad_parity(tensors):
    x, ln, lin = tensors

    def f_fused(x, ln, lin):
        return jnp.sum(jnp.sin(
            ln_linear(x, ln, lin, eps=EPS, interpret=True)))

    def f_ref(x, ln, lin):
        return jnp.sum(jnp.sin(_ref(x, ln, lin)))

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(x, ln, lin)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, ln, lin)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-4)


def test_odd_blocks(tensors):
    """Row/col counts that don't divide the default blocks fall back to
    smaller power-of-two blocks, not wrong output."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((24, D)), jnp.float32)
    ln = {"scale": jnp.ones(D), "bias": jnp.zeros(D)}
    lin = {"w": jnp.asarray(rng.standard_normal((D, 384)) * 0.05,
                            jnp.float32)}
    y = ln_linear(x, ln, lin, eps=EPS, interpret=True)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_ref(x, ln, lin)),
                               atol=1e-4, rtol=1e-5)


def test_availability_gate(tensors):
    x, ln, lin = tensors
    # CPU backend -> unavailable (kernel is TPU-only outside interpret)
    assert not ln_linear_available(x, lin)
    lora = dict(lin, lora_a=jnp.zeros((D, 2)), lora_b=jnp.zeros((2, F)))
    assert not ln_linear_available(x, lora)


def test_fuse_switch_defaults_off_and_is_cpu_safe():
    """The production trace-time switch is OFF (the measured-neutral
    receipt); flipping it on a CPU backend must still take the unfused
    path (availability gate) — the probe's A/B depends on this wiring."""
    from missm_tpu.core.config import tiny_tower
    from missm_tpu.kernels import ln_linear as lnmod
    from missm_tpu.models.tower import init_vision_params, vision_features

    assert lnmod.FUSE_LN2_FC1 is False
    cfg = tiny_tower("image").vision
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    ref = vision_features(params, cfg, px)
    try:
        lnmod.FUSE_LN2_FC1 = True
        out = vision_features(params, cfg, px)
    finally:
        lnmod.FUSE_LN2_FC1 = False
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=0, rtol=0)
