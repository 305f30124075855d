"""Fused-attention kernel numerics (interpret mode on CPU) + custom-VJP
gradient parity vs the XLA einsum formulation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.kernels.flash_attention import (
    fused_attention, fused_attention_ad,
)


def _ref_attention(q, k, v):
    D = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * (D ** -0.5)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("n", [8, 17, 257])
def test_kernel_matches_reference(rng, n):
    q = jnp.asarray(rng.standard_normal((4, n, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((4, n, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((4, n, 64)).astype(np.float32))
    got = fused_attention(q, k, v, interpret=True)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_custom_vjp_matches_einsum_grads(rng):
    q = jnp.asarray(rng.standard_normal((2, 16, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 16, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 16, 64)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v) ** 2)

    # drive the custom bwd directly (the pallas fwd runs interpreted on CPU
    # only; here we validate the bwd math against autodiff of the ref)
    from missm_tpu.kernels.flash_attention import _fa_bwd
    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    out = _ref_attention(q, k, v)
    g = 2.0 * out
    got_grads = _fa_bwd((q, k, v), g)
    for a, b in zip(got_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3)
