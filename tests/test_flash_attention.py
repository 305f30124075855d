"""Fused-attention kernel numerics (interpret mode on CPU) + custom-VJP
gradient parity vs the XLA einsum formulation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.kernels.flash_attention import (
    _einsum_reference, _fa_bwd, fused_attention,
)


@pytest.mark.parametrize("n,heads,group", [(8, 2, 1), (17, 4, 2),
                                           (257, 8, 4)])
def test_kernel_matches_reference(rng, n, heads, group):
    D = heads * 64
    q = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    got = fused_attention(q, k, v, heads, group=group, interpret=True)
    ref = _einsum_reference(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_custom_vjp_matches_einsum_grads(rng):
    heads = 2
    D = heads * 64
    q = jnp.asarray(rng.standard_normal((2, 16, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 16, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 16, D)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(_einsum_reference(q, k, v, heads) ** 2)

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    out = _einsum_reference(q, k, v, heads)
    g = 2.0 * out
    got_grads = _fa_bwd(heads, 0, (q, k, v), g)
    for a, b in zip(got_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3)
