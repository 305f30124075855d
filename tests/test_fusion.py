"""Mask semantics + shape tests for all 12 fusion heads, plus torch parity
for the inter-attention head and dense-SuperGAT self-loop semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.core.config import MODALITY_CODES
from missm_tpu.models.fusion import (
    FUSION_TYPES, FusionConfig, fusion_forward, init_fusion, set_statistics,
)
from missm_tpu.ops.graph import (
    init_supergat_layer, modality_adjacency, supergat_dense,
)

MODS = ("language", "video", "audio")
B = 6
FEAT = 16


def make_cfg(ftype):
    return FusionConfig(fusion_type=ftype, modality_types=MODS,
                        output_dims=3, feature_dims=FEAT, fusion_dim=8,
                        dropout_prob=0.1)


def make_embeds(seed=0):
    rng = np.random.default_rng(seed)
    return {m: jnp.asarray(rng.standard_normal((B, FEAT)).astype(np.float32))
            for m in MODS}


def make_missing():
    # samples: complete, missing language, missing video, missing audio, ...
    codes = [0, MODALITY_CODES["language"], MODALITY_CODES["video"],
             MODALITY_CODES["audio"], 0, MODALITY_CODES["video"]]
    return jnp.asarray(codes, dtype=jnp.int32)


@pytest.mark.parametrize("ftype", FUSION_TYPES)
def test_shapes_and_finiteness(ftype):
    cfg = make_cfg(ftype)
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    logits, aux = fusion_forward(params, cfg, make_embeds(), make_missing())
    assert logits.shape == (B, 3)
    assert np.isfinite(np.asarray(logits)).all()


# Heads whose eval output must be invariant to the *content* of a missing
# modality's embedding (it is zeroed / replaced / masked out).
INVARIANT = ("sum", "concat", "regression", "intra_attention",
             "inter_attention", "dedicated_dnn", "Distill_tea", "MTD_stu",
             "KL_stu", "self_distill")


@pytest.mark.parametrize("ftype", INVARIANT)
def test_missing_content_invariance(ftype):
    cfg = make_cfg(ftype)
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    embeds = make_embeds()
    missing = make_missing()
    out1, _ = fusion_forward(params, cfg, embeds, missing)
    # scribble over the missing modalities' embeddings row-by-row
    embeds2 = dict(embeds)
    for m in MODS:
        mask = np.asarray(missing) == MODALITY_CODES[m]
        e = np.asarray(embeds2[m]).copy()
        e[mask] = 1e3
        embeds2[m] = jnp.asarray(e)
    out2, _ = fusion_forward(params, cfg, embeds2, missing)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


@pytest.mark.parametrize("ftype", ("graph_fusion", "unified_graph"))
def test_graph_heads_selfloop_leak(ftype):
    """Reference quirk: missing nodes still reach the node-mean through their
    self-loop (baseline.py:266,318), so the output is NOT invariant to a
    missing node's features."""
    cfg = make_cfg(ftype)
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    embeds = make_embeds()
    missing = make_missing()
    out1, _ = fusion_forward(params, cfg, embeds, missing)
    e = np.asarray(embeds["video"]).copy()
    e[np.asarray(missing) == MODALITY_CODES["video"]] += 10.0
    out2, _ = fusion_forward(params, cfg, dict(embeds, video=jnp.asarray(e)),
                             missing)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_concat_statistics_imputation():
    """A sample missing modality m must behave exactly as if its embedding
    were the registered statistic (reference baseline.py:81-82)."""
    cfg = make_cfg("concat")
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    stat = {m: np.full((FEAT,), 0.5, np.float32) for m in MODS}
    params = set_statistics(params, stat)
    embeds = make_embeds()
    missing = jnp.asarray([MODALITY_CODES["video"]] + [0] * (B - 1),
                          dtype=jnp.int32)
    out1, _ = fusion_forward(params, cfg, embeds, missing)
    embeds2 = dict(embeds)
    e = np.asarray(embeds2["video"]).copy()
    e[0] = 0.5
    embeds2["video"] = jnp.asarray(e)
    out2, _ = fusion_forward(params, cfg, embeds2,
                             jnp.zeros((B,), jnp.int32))
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                               atol=1e-5)


def test_dedicated_routing_matches_branches():
    """Complete samples use the 'full' branch; missing-m samples use the
    leave-m-out branch (reference baseline.py:350-352)."""
    cfg = make_cfg("dedicated_dnn")
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    embeds = make_embeds()
    all_complete = jnp.zeros((B,), jnp.int32)
    all_missing_v = jnp.full((B,), MODALITY_CODES["video"], jnp.int32)
    out_c, _ = fusion_forward(params, cfg, embeds, all_complete)
    out_m, _ = fusion_forward(params, cfg, embeds, all_missing_v)
    assert not np.allclose(np.asarray(out_c), np.asarray(out_m))


def test_self_distill_train_aux():
    cfg = make_cfg("self_distill")
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    logits, aux = fusion_forward(params, cfg, make_embeds(), make_missing(),
                                 train=True, rng=jax.random.PRNGKey(1))
    assert aux["stu_features"].shape == (B, len(MODS), cfg.fusion_dim)
    assert aux["tea_features"].shape == (B, cfg.fusion_dim)
    assert aux["present_masks"].shape == (B, len(MODS))
    # present mask: complete sample has all True
    assert np.asarray(aux["present_masks"])[0].all()


def test_distill_features_are_masked_concat():
    cfg = make_cfg("Distill_tea")
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    embeds = make_embeds()
    missing = make_missing()
    _, aux = fusion_forward(params, cfg, embeds, missing)
    feats = np.asarray(aux["features"])
    assert feats.shape == (B, FEAT * len(MODS))
    # sample 1 misses language (slot 0) -> zeros there
    assert (feats[1, :FEAT] == 0).all()
    np.testing.assert_allclose(feats[0, :FEAT],
                               np.asarray(embeds["language"])[0])


def test_inter_attention_torch_parity():
    """Dense cross-attention must match torch nn.MultiheadAttention with a
    key_padding_mask (reference baseline.py:218-233)."""
    torch = pytest.importorskip("torch")
    cfg = make_cfg("inter_attention")
    params = init_fusion(jax.random.PRNGKey(3), cfg)
    d = cfg.fusion_dim
    mha = torch.nn.MultiheadAttention(d, num_heads=4, batch_first=True)
    with torch.no_grad():
        wq = np.asarray(params["attn"]["q"]["w"]).T
        wk = np.asarray(params["attn"]["k"]["w"]).T
        wv = np.asarray(params["attn"]["v"]["w"]).T
        mha.in_proj_weight.copy_(torch.tensor(np.concatenate([wq, wk, wv])))
        mha.in_proj_bias.copy_(torch.tensor(np.concatenate(
            [np.asarray(params["attn"][x]["b"]) for x in ("q", "k", "v")])))
        mha.out_proj.weight.copy_(
            torch.tensor(np.asarray(params["attn"]["out"]["w"]).T))
        mha.out_proj.bias.copy_(
            torch.tensor(np.asarray(params["attn"]["out"]["b"])))

    rng = np.random.default_rng(7)
    tokens = rng.standard_normal((B, len(MODS), d)).astype(np.float32)
    query = np.broadcast_to(np.asarray(params["query_token"]),
                            (B, 1, d)).copy()
    missing = make_missing()
    pad = np.stack([np.asarray(missing) == MODALITY_CODES[m] for m in MODS],
                   1)

    with torch.no_grad():
        ref, _ = mha(torch.tensor(query), torch.tensor(tokens),
                     torch.tensor(tokens),
                     key_padding_mask=torch.tensor(pad))
    ref = ref.numpy()[:, 0]

    # drive the same math through the head by bypassing the projections:
    # feed embeds whose projections equal `tokens`. Instead, call the
    # internals directly: emulate with identity proj by solving is overkill —
    # recompute the attention here with the head's params.
    from missm_tpu.models.fusion import _fwd_inter_attention  # internals

    class _Id:
        pass

    # Build embeds s.t. proj(embeds)=tokens: use least squares per modality.
    embeds = {}
    for i, m in enumerate(MODS):
        W = np.asarray(params["proj"][m]["w"])  # (FEAT, d)
        b = np.asarray(params["proj"][m]["b"])
        X = np.linalg.lstsq(W.T, (tokens[:, i] - b).T, rcond=None)[0].T
        embeds[m] = jnp.asarray(X.astype(np.float32))
        np.testing.assert_allclose(X @ W + b, tokens[:, i], atol=1e-4)

    out, _ = fusion_forward(params, cfg, embeds, missing)
    # reproduce the tail: layer_norm+head applied to ref must equal `out`
    from missm_tpu.ops.basic import layer_norm, linear
    ref_t = layer_norm(params["norm"], jnp.asarray(ref))
    ref_logits = linear(params["head"]["fc2"],
                        jax.nn.relu(linear(params["head"]["fc1"], ref_t)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_logits),
                               atol=2e-4, rtol=1e-3)


def test_supergat_isolated_node_selfloop():
    """An isolated node (all neighbors masked but the self-loop) must output
    exactly W x_i + bias (softmax over a single element)."""
    p = init_supergat_layer(jax.random.PRNGKey(0), 8, 8, 1, False)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 3, 8)).astype(np.float32))
    present = jnp.asarray([[False, True, True]])
    adj = modality_adjacency(present)
    out = supergat_dense(p, x, adj, heads=1, concat=False)
    expected = np.asarray(x[0, 0] @ p["w"]) + np.asarray(p["bias"])
    np.testing.assert_allclose(np.asarray(out[0, 0]), expected, atol=1e-5)
