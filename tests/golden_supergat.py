"""Independent torch transcription of torch_geometric's `SuperGATConv`
forward (attention_type='MX', the reference's configuration —
/root/reference/src/model/baseline.py:11-24).

torch_geometric is not installable in this environment, so this is the
next-best golden: a from-scratch EDGE-LIST implementation (scatter softmax
over an explicit edge_index, exactly PyG's message-passing formulation in
torch_geometric/nn/conv/supergat_conv.py) written independently of
missm_tpu.ops.graph's dense-masked-matmul formulation. A sign, axis, or
i/j-orientation mistake in either implementation will disagree with the
other; both agreeing with random weights across many edge patterns pins
the semantics.

PyG conventions reproduced:
- edge (j -> i): j = edge_index[0] (source), i = edge_index[1] (target);
  out[i] aggregates over incoming edges.
- MX attention: logits = (h_i * h_j).sum(-1);
  alpha = ((h_j * att_l).sum(-1) + (h_i * att_r).sum(-1)) * sigmoid(logits)
- leaky_relu(alpha, 0.2), scatter-softmax over each target's incoming
  edges, out = sum_j alpha_ij * h_j; concat heads or mean; + bias.
- add_self_loops: remove existing self-loops, then add (i, i) for EVERY
  node.
"""
import torch


def add_self_loops(edge_index, num_nodes):
    mask = edge_index[0] != edge_index[1]
    ei = edge_index[:, mask]
    loops = torch.arange(num_nodes, dtype=ei.dtype).repeat(2, 1)
    return torch.cat([ei, loops], dim=1)


def scatter_softmax(src, index, num_nodes):
    """src: [E, H] edge scores; softmax over edges sharing a target index."""
    vmax = torch.full((num_nodes, src.size(1)), float("-inf"))
    vmax = vmax.index_reduce(0, index, src, "amax", include_self=True)
    ex = (src - vmax[index]).exp()
    denom = torch.zeros((num_nodes, src.size(1)))
    denom = denom.index_add(0, index, ex)
    return ex / denom[index].clamp_min(1e-16)


def supergat_mx_forward(x, edge_index, weight, att_l, att_r, bias, *,
                        heads, out_channels, concat,
                        negative_slope=0.2):
    """x: [N, C_in]; edge_index: [2, E] (before self-loops);
    weight: [C_in, H*C]; att_l/att_r: [H, C]; bias: [H*C] or [C]."""
    n = x.size(0)
    edge_index = add_self_loops(edge_index, n)
    j, i = edge_index[0], edge_index[1]          # source, target

    h = (x @ weight).view(n, heads, out_channels)
    h_i, h_j = h[i], h[j]                        # [E, H, C]

    logits = (h_i * h_j).sum(dim=-1)             # [E, H]
    alpha = (h_j * att_l).sum(-1) + (h_i * att_r).sum(-1)
    alpha = alpha * torch.sigmoid(logits)
    alpha = torch.nn.functional.leaky_relu(alpha, negative_slope)
    alpha = scatter_softmax(alpha, i, n)         # over incoming edges of i

    msg = h_j * alpha.unsqueeze(-1)              # [E, H, C]
    out = torch.zeros((n, heads, out_channels))
    out = out.index_add(0, i, msg)
    out = out.reshape(n, heads * out_channels) if concat else out.mean(dim=1)
    return out + bias


def fusion_gcn_forward(x, edge_index, p1, p2, heads):
    """The reference fusion_gcn: SuperGAT(in->hidden, H, concat) -> exact
    GELU -> SuperGAT(hidden*H -> out, 1 head, mean)."""
    h = supergat_mx_forward(x, edge_index, **p1, heads=heads, concat=True)
    h = torch.nn.functional.gelu(h)
    return supergat_mx_forward(h, edge_index, **p2, heads=1, concat=False)


def verify_against_real_pyg(trials=50, seed=0):
    """Regeneration / upgrade path (docs/MIGRATION.md "First network
    access"): with torch_geometric installed, compare this transcription
    against the REAL `SuperGATConv` forward over random graphs. Run:

        pip install torch_geometric
        python -m tests.golden_supergat

    Any disagreement means the transcription (and therefore the dense
    missm_tpu.ops.graph pin) misread PyG — fix here, then re-run
    tests/test_supergat_golden.py."""
    from torch_geometric.nn import SuperGATConv

    torch.manual_seed(seed)
    worst = 0.0
    for trial in range(trials):
        n = int(torch.randint(2, 6, ()))
        c_in, c_out, heads = 8, 6, 2
        conv = SuperGATConv(c_in, c_out, heads=heads, concat=True,
                            attention_type="MX").eval()
        pairs = [(a, b) for a in range(n) for b in range(n) if a != b]
        keep = torch.rand(len(pairs)) < 0.6
        ei = torch.tensor([p for p, k in zip(pairs, keep) if k],
                          dtype=torch.long).t().reshape(2, -1)
        x = torch.randn(n, c_in)
        with torch.no_grad():
            ref = conv(x, ei)
            got = supergat_mx_forward(
                x, ei, conv.lin.weight.t(), conv.att_l.squeeze(0),
                conv.att_r.squeeze(0), conv.bias, heads=heads,
                out_channels=c_out, concat=True)
        worst = max(worst, float((ref - got).abs().max()))
    print(f"max |Δ| vs real SuperGATConv over {trials} graphs: {worst:.2e}")
    assert worst < 1e-5, "transcription disagrees with torch_geometric"
    print("GOLDEN VERIFIED against real torch_geometric")


if __name__ == "__main__":
    verify_against_real_pyg()
