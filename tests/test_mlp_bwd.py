"""Fused MLP-backward dx kernel (kernels/mlp_bwd.py): numerics vs the
autodiff chain, padding path, and dtype handling — interpret mode on CPU
(the real-kernel A/B lives in scripts/mlp_bwd_probe.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.kernels.mlp_bwd import mlp_bwd_dx, mlp_bwd_dx_xla
from missm_tpu.ops.basic import quick_gelu


def _data(m, d, ff, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((m, d)), dtype),
            jnp.asarray(rng.standard_normal((m, ff)) * 0.5, dtype),
            jnp.asarray(rng.standard_normal((d, ff)) * 0.05, dtype),
            jnp.asarray(rng.standard_normal((ff, d)) * 0.05, dtype))


@pytest.mark.parametrize("m,bm,bf", [(64, 32, 64), (80, 32, 64)])
def test_fused_matches_autodiff(m, bm, bf):
    """dh from the fused kernel == the vjp of the quick_gelu MLP chain
    wrt its pre-activation, chained through the fc1 dx matmul. The
    (80, 32) case exercises a ragged final token block (grid padding
    must not corrupt valid rows)."""
    d, ff = 128, 256
    dy, wide, w1, w2 = _data(m, d, ff)

    def f(w):
        return quick_gelu(w) @ w2

    _, pull = jax.vjp(f, wide)
    (dwide,) = pull(dy)
    want = dwide @ w1.T

    got = mlp_bwd_dx(dy, wide, w1, w2, bm=bm, bf=bf, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    # and the hand-rolled XLA reference used by the probe agrees too
    ref = mlp_bwd_dx_xla(dy, wide, w1, w2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_fused_bf16_close_to_f32():
    d, ff = 128, 256
    dy, wide, w1, w2 = _data(64, d, ff)
    want = mlp_bwd_dx(dy, wide, w1, w2, bm=32, bf=64, interpret=True)
    got = mlp_bwd_dx(dy.astype(jnp.bfloat16), wide.astype(jnp.bfloat16),
                     w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                     bm=32, bf=64, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.15, rtol=0.1)
