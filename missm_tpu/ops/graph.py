"""Dense SuperGAT over tiny per-sample modality graphs.

The reference's two graph fusion heads run torch_geometric `SuperGATConv`
over per-sample graphs of at most 5 nodes (one per modality; edges between
*present* modality pairs — baseline.py:270-279). Sparse scatter kernels are
the wrong tool on TPU for 5-node graphs: here the whole thing is a masked
dense attention over [B, M, M], one fused batched matmul chain on the MXU.

Semantics implemented (SuperGAT 'MX' attention, the torch_geometric default):
  h_j = x_j W                                  (per head)
  e_ij = (att_l . h_j + att_r . h_i) * sigmoid(h_i . h_j)
  a_ij = softmax_j( leaky_relu(e_ij, 0.2) )    over the masked neighborhood
  out_i = sum_j a_ij h_j  (+ bias)
Self-loops are always present (torch_geometric adds them for every node, so
isolated — fully-missing — nodes attend to themselves).
Heads are concatenated when `concat=True`, averaged otherwise.

The self-supervised edge-scoring loss of SuperGAT is a train-time auxiliary
objective in torch_geometric that the reference never wires into its loss
(baseline.py:18-24 only uses the conv outputs), so it does not affect the
forward pass and is intentionally not reproduced.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_supergat(key, in_dim: int, out_dim: int, heads: int,
                  dtype=jnp.float32):
    """Glorot for W (PyG default), glorot for att vectors, zero bias."""
    k1, k2, k3 = jax.random.split(key, 3)
    limit_w = (6.0 / (in_dim + heads * out_dim)) ** 0.5
    # PyG glorot on the (1, heads, out_channels) att tensors uses
    # fan_in = size(-2) = heads, fan_out = out_channels
    limit_a = (6.0 / (heads + out_dim)) ** 0.5
    return {
        "w": jax.random.uniform(k1, (in_dim, heads * out_dim), dtype,
                                -limit_w, limit_w),
        "att_l": jax.random.uniform(k2, (heads, out_dim), dtype,
                                    -limit_a, limit_a),
        "att_r": jax.random.uniform(k3, (heads, out_dim), dtype,
                                    -limit_a, limit_a),
        "bias": None,  # filled by caller variant below
    }


def init_supergat_layer(key, in_dim, out_dim, heads, concat, dtype=jnp.float32):
    p = init_supergat(key, in_dim, out_dim, heads, dtype)
    bias_dim = heads * out_dim if concat else out_dim
    p["bias"] = jnp.zeros((bias_dim,), dtype)
    return p


def supergat_dense(params, x, adj, *, heads: int, concat: bool,
                   negative_slope: float = 0.2):
    """x: [B, M, C_in]; adj: [B, M, M] bool (True = edge j->i exists,
    diagonal True). Returns [B, M, heads*C_out] (concat) or [B, M, C_out]."""
    B, M, _ = x.shape
    h = jnp.einsum("bmc,cd->bmd", x, params["w"],
                   preferred_element_type=jnp.float32)
    C = h.shape[-1] // heads
    h = h.reshape(B, M, heads, C)

    # e_go[b,i,j,h]: att_l . h_j + att_r . h_i   (i = target, j = source)
    al = jnp.einsum("bjhc,hc->bjh", h, params["att_l"])
    ar = jnp.einsum("bihc,hc->bih", h, params["att_r"])
    e_go = al[:, None, :, :] + ar[:, :, None, :]          # [B, i, j, H]
    e_dp = jnp.einsum("bihc,bjhc->bijh", h, h)            # dot-product term
    e = e_go * jax.nn.sigmoid(e_dp)
    e = jax.nn.leaky_relu(e, negative_slope)

    neg = jnp.finfo(e.dtype).min
    e = jnp.where(adj[:, :, :, None], e, neg)
    a = jax.nn.softmax(e, axis=2)
    # guard: rows with no neighbors at all would softmax over -inf only;
    # adj always has the diagonal so this cannot produce NaN, but keep the
    # where for safety under fully-masked rows.
    a = jnp.where(adj[:, :, :, None], a, 0.0)

    out = jnp.einsum("bijh,bjhc->bihc", a, h)
    out = out.reshape(B, M, heads * C) if concat else out.mean(axis=2)
    return out + params["bias"]


def modality_adjacency(present, self_loops: bool = True):
    """present: [B, M] bool -> adjacency [B, M, M]: edges between distinct
    present pairs (reference `bulid_edge`, baseline.py:270-279) plus
    self-loops for every node (torch_geometric add_self_loops)."""
    pair = present[:, :, None] & present[:, None, :]
    M = present.shape[1]
    eye = jnp.eye(M, dtype=bool)[None]
    adj = pair & ~eye
    if self_loops:
        adj = adj | eye
    return adj


def full_adjacency(batch: int, m: int):
    """All distinct pairs + self loops (unified_graph stage 2,
    baseline.py:315)."""
    return jnp.ones((batch, m, m), dtype=bool)


def init_fusion_gcn(key, in_dim=256, hidden=128, out_dim=256, heads=4,
                    dtype=jnp.float32):
    """The reference `fusion_gcn`: SuperGAT(in->hidden, H, concat) -> GELU ->
    SuperGAT(hidden*H -> out, 1 head, no concat) (baseline.py:11-24)."""
    k1, k2 = jax.random.split(key)
    return {
        "gat1": init_supergat_layer(k1, in_dim, hidden, heads, True, dtype),
        "gat2": init_supergat_layer(k2, hidden * heads, out_dim, 1, False,
                                    dtype),
    }


def fusion_gcn_forward(params, x, adj):
    # heads recovered from the att tensor's STATIC shape — an int leaf in
    # the params pytree would break jax.grad (int32 input) and make the
    # supergat reshape dims tracers under jit
    heads = params["gat1"]["att_l"].shape[0]
    h = supergat_dense(params["gat1"], x, adj, heads=heads,
                       concat=True)
    h = jax.nn.gelu(h, approximate=False)  # torch nn.GELU default is exact
    return supergat_dense(params["gat2"], h, adj, heads=1, concat=False)
