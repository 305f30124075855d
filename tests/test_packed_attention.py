"""Packed short-sequence (block-diagonal) attention: kernel numerics in
interpret mode and equivalence of packed vs per-instance attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.kernels.flash_attention import (
    _einsum_reference, fused_attention,
)


def test_block_diag_kernel_matches_reference(rng):
    heads, hd, T = 2, 64, 8
    D = heads * hd
    q = jnp.asarray(rng.standard_normal((2, 128, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 128, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 128, D)).astype(np.float32))
    got = fused_attention(q, k, v, heads, group=2, block_diag=T,
                          interpret=True)
    ref = _einsum_reference(q, k, v, heads, block_diag=T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_packed_equals_per_instance(rng):
    """Packing instances with a block-diagonal mask must equal running each
    T-length instance independently."""
    heads, hd, T, M = 2, 64, 8, 16
    D = heads * hd
    q = rng.standard_normal((M, T, D)).astype(np.float32)
    k = rng.standard_normal((M, T, D)).astype(np.float32)
    v = rng.standard_normal((M, T, D)).astype(np.float32)

    per_instance = _einsum_reference(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), heads)

    pack = 128 // T
    packed = [x.reshape(M // pack, pack * T, D) for x in (q, k, v)]
    out = _einsum_reference(jnp.asarray(packed[0]), jnp.asarray(packed[1]),
                            jnp.asarray(packed[2]), heads, block_diag=T)
    out = np.asarray(out).reshape(M, T, D)
    np.testing.assert_allclose(out, np.asarray(per_instance), atol=2e-5,
                               rtol=1e-4)


def test_short_attention_cpu_fallback_matches(rng):
    """On CPU short_attention falls back to the einsum path; verify it
    matches per-instance attention (same params)."""
    from missm_tpu.ops.attention import multi_head_attention, short_attention

    heads, hd, T, M = 2, 16, 4, 6
    D = heads * hd
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    params = {}
    for i, name in enumerate(("q", "k", "v", "out")):
        params[name] = {
            "w": jax.random.normal(keys[2 * i], (D, D)) * 0.1,
            "b": jax.random.normal(keys[2 * i + 1], (D,)) * 0.1,
        }
    x = jnp.asarray(rng.standard_normal((M, T, D)).astype(np.float32))
    a = short_attention(params, x, num_heads=heads)
    b = multi_head_attention(params, x, num_heads=heads)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _checkpoint_names(jaxpr):
    """All checkpoint_name tags in a (closed) jaxpr, recursively."""
    names = []
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "name":
            names.append(eqn.params["name"])
        for v in eqn.params.values():
            if hasattr(v, "eqns"):
                names.extend(_checkpoint_names(v))
            elif hasattr(v, "jaxpr"):
                names.extend(_checkpoint_names(v.jaxpr))
    return names


def test_temporal_qkv_tag_on_every_path(rng):
    """Temporal attention must tag its q/k/v 'tqkv' (never 'qkv') on BOTH
    the packed path and the einsum fallback: a fallback shape (T not
    dividing pack_to) that re-tagged 'qkv' would silently re-save temporal
    qkv under save_attn_mlp_qkv — the doubled-footprint OOM the split tag
    exists to prevent."""
    from missm_tpu.ops.attention import short_attention

    heads, hd = 2, 64
    D = heads * hd
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    params = {}
    for i, name in enumerate(("q", "k", "v", "out")):
        params[name] = {
            "w": jax.random.normal(keys[2 * i], (D, D)) * 0.1,
            "b": jax.random.normal(keys[2 * i + 1], (D,)) * 0.1,
        }
    # T=8 divides 128 -> packed path; T=6 does not -> einsum fallback
    for T, M in ((8, 16), (6, 16)):
        x = jnp.asarray(rng.standard_normal((M, T, D)).astype(np.float32))
        jaxpr = jax.make_jaxpr(
            lambda p, x: short_attention(p, x, num_heads=heads))(params, x)
        names = _checkpoint_names(jaxpr.jaxpr)
        assert "tqkv" in names, (T, names)
        assert "qkv" not in names, (T, names)
