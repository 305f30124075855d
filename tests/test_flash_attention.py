"""Fused-attention kernel numerics (interpret mode on CPU) + custom-VJP
gradient parity vs the XLA einsum formulation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.kernels.flash_attention import (
    _einsum_reference, _fa_bwd, cls_split_available, fused_attention,
    fused_attention_bwd, fused_attention_cls, fused_attention_cls_bwd,
)


@pytest.mark.parametrize("n,heads,group,hd", [
    (8, 2, 2, 64), (17, 4, 2, 64), (257, 8, 4, 64),
    # UNPACKED kernel (_attn_kernel) coverage: an odd group == num_heads
    # (lane-valid via the g == H escape) and an hd=128 model (pair
    # packing impossible) both bypass the packed path.
    (17, 3, 3, 64), (33, 2, 2, 128)])
def test_kernel_matches_reference(rng, n, heads, group, hd):
    D = heads * hd
    q = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    got = fused_attention(q, k, v, heads, group=group, interpret=True)
    ref = _einsum_reference(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_explicit_group_is_validated_not_substituted(rng):
    """A requested head group that is not a lane-valid divisor (or would
    drop heads under packing) must raise — silent substitution mislabels
    probe data, and an unvalidated pass-through returns uninitialized
    output columns for the dropped heads."""
    D = 4 * 64
    q = jnp.asarray(rng.standard_normal((2, 16, D)).astype(np.float32))
    with pytest.raises(ValueError):
        fused_attention(q, q, q, 4, group=1, interpret=True)  # 64 lanes
    with pytest.raises(ValueError):
        fused_attention(q, q, q, 4, group=3, interpret=True)  # non-divisor
    with pytest.raises(ValueError):  # packed needs an even group
        fused_attention(jnp.asarray(
            rng.standard_normal((2, 16, 3 * 64)).astype(np.float32)),
            q[:, :, :192], q[:, :, :192], 3, group=3, packed=True,
            interpret=True)
    with pytest.raises(ValueError):
        fused_attention_bwd(q, q, q, q, 4, group=1, interpret=True)
    with pytest.raises(ValueError):
        fused_attention_bwd(q, q, q, q, 4, group=3, interpret=True)


@pytest.mark.parametrize("n,heads,group,block_diag", [
    (8, 2, 2, 0), (17, 4, 4, 0), (257, 16, 8, 0), (128, 4, 4, 8)])
def test_packed_pair_kernel_matches_reference(rng, n, heads, group,
                                              block_diag):
    """The 128-lane head-pair-packed kernel == einsum, incl. block-diag."""
    D = heads * 64
    q = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    got = fused_attention(q, k, v, heads, group=group, packed=True,
                          block_diag=block_diag, interpret=True)
    ref = _einsum_reference(q, k, v, heads, block_diag)
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


@pytest.mark.parametrize("n,heads", [(129, 2), (257, 4), (257, 16)])
def test_cls_split_kernel_matches_reference(rng, n, heads):
    """The CLS-split forward (K/V passed as [B,1,D] + [B,n-1,D]) == the
    einsum over the concatenated sequence."""
    D = heads * 64
    assert cls_split_available(heads, 64, n)
    q = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    got = fused_attention_cls(q, k[:, :1], k[:, 1:], v[:, :1], v[:, 1:],
                              heads, interpret=True)
    ref = _einsum_reference(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


@pytest.mark.parametrize("n,heads,group,bb", [(129, 2, 2, 1),
                                              (257, 4, 4, 1),
                                              (257, 16, 8, 1),
                                              (257, 4, 4, 2),
                                              (257, 16, 8, 4)])
def test_cls_split_bwd_matches_einsum_grads(rng, n, heads, group, bb):
    """CLS-split backward == autodiff of the einsum formulation, with the
    gradients re-split into (dq, dk_cls, dk_main, dv_cls, dv_main);
    batch_block > 1 (round-4 grid lever) must not change the math."""
    B = max(2, bb)
    D = heads * 64
    q = jnp.asarray(rng.standard_normal((B, n, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, n, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, n, D)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(_einsum_reference(q, k, v, heads) ** 2)

    ref_dq, ref_dk, ref_dv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g = 2.0 * _einsum_reference(q, k, v, heads)
    dq, dkc, dkm, dvc, dvm = fused_attention_cls_bwd(
        q, k[:, :1], k[:, 1:], v[:, :1], v[:, 1:], g, heads, group=group,
        batch_block=bb, interpret=True)
    for a, b in [(dq, ref_dq), (dkc, ref_dk[:, :1]), (dkm, ref_dk[:, 1:]),
                 (dvc, ref_dv[:, :1]), (dvm, ref_dv[:, 1:])]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3)


@pytest.mark.parametrize("n,heads", [(77, 12), (64, 2)])
@pytest.mark.parametrize("with_pad", [False, True])
def test_causal_kernel_matches_dense_bias_einsum(rng, n, heads, with_pad):
    """Fused causal (+ key-padding bias) == einsum with the dense composed
    mask — the text tower's attention."""
    from missm_tpu.ops.attention import causal_bias
    D = heads * 64
    q = jnp.asarray(rng.standard_normal((3, n, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, n, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((3, n, D)).astype(np.float32))
    lengths = rng.integers(4, n, size=3)
    neg = np.finfo(np.float32).min
    kb = np.zeros((3, 1, n), np.float32)
    if with_pad:
        for i, L in enumerate(lengths):
            kb[i, 0, L:] = neg
    got = fused_attention(q, k, v, heads, causal=True,
                          kbias=jnp.asarray(kb), interpret=True)

    # dense-bias einsum reference
    hd = 64
    qh = (q * hd ** -0.5).reshape(3, n, heads, hd)
    kh = k.reshape(3, n, heads, hd)
    vh = v.reshape(3, n, heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
    s = s + causal_bias(n) + jnp.asarray(kb)[:, :, None, :]
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(3, n, D)
    # padded-out query rows attend to nothing real; compare on valid rows
    got_np, ref_np = np.asarray(got), np.asarray(ref)
    np.testing.assert_allclose(got_np, ref_np, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("n,heads,group,block_diag,hd", [
    (257, 8, 4, 0, 64), (128, 4, 2, 8, 64),
    # even groups -> the head-pair-packed backward
    (16, 2, 2, 0, 64), (257, 16, 8, 0, 64), (128, 4, 4, 8, 64),
    # UNPACKED backward (_attn_bwd_kernel): odd group == num_heads, and
    # an hd=128 model where pair packing is impossible
    (17, 3, 3, 0, 64), (33, 2, 2, 0, 128)])
def test_fused_bwd_kernel_matches_einsum_grads(rng, n, heads, group,
                                               block_diag, hd):
    """The Pallas backward (scores recomputed in VMEM) == autodiff of the
    einsum formulation, incl. the packed block-diagonal mode."""
    D = heads * hd
    q = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, n, D)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(_einsum_reference(q, k, v, heads, block_diag) ** 2)

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g = 2.0 * _einsum_reference(q, k, v, heads, block_diag)
    got = fused_attention_bwd(q, k, v, g, heads, block_diag=block_diag,
                              group=group, interpret=True)
    for a, b in zip(got, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3)
