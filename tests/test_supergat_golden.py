"""Golden semantics test for the dense SuperGAT (VERDICT r1 weak #5).

torch_geometric is not installable here, so the golden is an independent
edge-list transcription of PyG's `SuperGATConv` MX forward
(tests/golden_supergat.py) — scatter softmax over an explicit edge_index,
structurally disjoint from missm_tpu.ops.graph's masked-dense-matmul
formulation. A sign, softmax-axis, or i/j-orientation mistake in the dense
version cannot agree with the edge-list version across random weights and
many mask patterns.

Reference config under test: /root/reference/src/model/baseline.py:11-24
(fusion_gcn: SuperGAT(in->hidden, 4 heads, concat) -> GELU ->
SuperGAT(hidden*4 -> out, 1 head, mean)), with the per-sample modality
graphs of baseline.py:270-279 (edges between present pairs + self-loops).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from missm_tpu.ops.graph import (
    fusion_gcn_forward, init_fusion_gcn, init_supergat_layer,
    modality_adjacency, supergat_dense,
)
from tests import golden_supergat as gold


def _edge_index_from_present(present):
    """Directed edges both ways between distinct present modality pairs —
    the reference's bulid_edge (baseline.py:270-279), pre-self-loop."""
    idx = np.nonzero(present)[0]
    src, dst = [], []
    for i in idx:
        for j in idx:
            if i != j:
                src.append(j)
                dst.append(i)
    if not src:  # golden's add_self_loops needs a well-formed empty [2, 0]
        return torch.zeros((2, 0), dtype=torch.long)
    return torch.tensor([src, dst], dtype=torch.long)


MASKS = [
    [1, 1, 1],          # all present
    [1, 0, 1],          # one missing (isolated node keeps its self-loop)
    [0, 1, 0],          # only one present
    [0, 0, 0],          # fully missing: every node isolated
    [1, 1, 0],
]


@pytest.mark.parametrize("heads,concat", [(4, True), (1, False), (2, False)])
def test_supergat_layer_matches_edge_list_golden(heads, concat):
    rng = np.random.default_rng(0)
    C_in, C_out, M = 12, 8, 3
    p = init_supergat_layer(jax.random.PRNGKey(1), C_in, C_out, heads, concat)
    p = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.standard_normal(x.shape), jnp.float32), p)

    present = np.array(MASKS, dtype=bool)               # [B, M]
    x = rng.standard_normal((present.shape[0], M, C_in)).astype(np.float32)

    adj = modality_adjacency(jnp.asarray(present))
    ours = np.asarray(supergat_dense(p, jnp.asarray(x), adj,
                                     heads=heads, concat=concat))

    for b in range(present.shape[0]):
        ref = gold.supergat_mx_forward(
            torch.from_numpy(x[b]),
            _edge_index_from_present(present[b]),
            weight=torch.from_numpy(np.asarray(p["w"])),
            att_l=torch.from_numpy(np.asarray(p["att_l"])),
            att_r=torch.from_numpy(np.asarray(p["att_r"])),
            bias=torch.from_numpy(np.asarray(p["bias"])),
            heads=heads, out_channels=C_out, concat=concat)
        np.testing.assert_allclose(ours[b], ref.numpy(), atol=1e-5, rtol=1e-5)


def test_fusion_gcn_two_layer_matches_golden():
    """Full fusion_gcn (both reference configs' shape: concat 4-head ->
    GELU -> 1-head mean) against the golden two-layer composition."""
    rng = np.random.default_rng(1)
    M, IN, HID, OUT, H = 3, 16, 8, 16, 4
    p = init_fusion_gcn(jax.random.PRNGKey(2), IN, HID, OUT, H)
    p = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        if hasattr(x, "shape") else x, p)

    present = np.array(MASKS, dtype=bool)
    x = rng.standard_normal((present.shape[0], M, IN)).astype(np.float32)
    adj = modality_adjacency(jnp.asarray(present))
    ours = np.asarray(fusion_gcn_forward(p, jnp.asarray(x), adj))

    def torch_params(layer):
        return dict(weight=torch.from_numpy(np.asarray(layer["w"])),
                    att_l=torch.from_numpy(np.asarray(layer["att_l"])),
                    att_r=torch.from_numpy(np.asarray(layer["att_r"])),
                    bias=torch.from_numpy(np.asarray(layer["bias"])))

    p1 = dict(torch_params(p["gat1"]), out_channels=HID)
    p2 = dict(torch_params(p["gat2"]), out_channels=OUT)
    for b in range(present.shape[0]):
        ei = _edge_index_from_present(present[b])
        ref = gold.fusion_gcn_forward(torch.from_numpy(x[b]), ei, p1, p2,
                                      heads=H)
        np.testing.assert_allclose(ours[b], ref.numpy(), atol=1e-4, rtol=1e-4)
