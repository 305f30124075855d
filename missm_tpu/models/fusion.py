"""The twelve fusion / imputation heads, as pure masked dense ops.

Functional re-design of the reference's `src/model/baseline.py`: every head
is `init_*(key, cfg) -> params` plus a shared
`fusion_forward(params, cfg, embeds, missing_index, ...) -> (logits, aux)`.

The per-sample scalar `missing_index` (0 = complete, else MODALITY_CODES)
becomes boolean masks compiled into the jitted graph: the reference's
in-place boolean-mask mutations (`data[mask] = 0`, baseline.py:57, 82, 143,
311, 352, 374, 404) are `jnp.where` selects here — numerically identical,
but static-shaped and fusable by XLA.

Head-by-head reference citations:
  sum                 baseline.py:43-61
  concat (zero/mean/median impute)   baseline.py:65-90
  regression          baseline.py:94-149
  retrieval (concat_full)            baseline.py:153-169
  intra_attention     baseline.py:173-203
  inter_attention     baseline.py:207-236
  graph_fusion        baseline.py:240-279
  unified_graph       baseline.py:283-331
  dedicated_dnn       baseline.py:335-354
  distillation (Distill_tea / MTD_stu / KL_stu)  baseline.py:358-380
  self_distill        baseline.py:384-418
Known reference quirk preserved: in the graph heads, *missing* modality
nodes still contribute to the node-mean through their self-loop
(baseline.py:266, 318 mean over all M nodes).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp

from ..core.config import MODALITY_CODES
from ..ops.basic import dropout, layer_norm, linear
from ..ops.graph import (
    fusion_gcn_forward, full_adjacency, init_fusion_gcn, modality_adjacency,
)

DISTILL_TYPES = ("Distill_tea", "MTD_stu", "KL_stu")


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    fusion_type: str
    modality_types: Tuple[str, ...]
    output_dims: int
    feature_dims: int = 768
    fusion_dim: int = 256
    dropout_prob: float = 0.1

    @property
    def num_modalities(self) -> int:
        return len(self.modality_types)


# -- init helpers (torch nn.Linear default init: U(±1/sqrt(fan_in))) --------

def _torch_linear(key, d_in, d_out, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
    }


def _ln(d, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _init_head(key, cfg: FusionConfig, in_dim: int):
    """The shared classifier head: Linear -> ReLU -> Dropout -> Linear
    (reference `Head`, baseline.py:27-39)."""
    k1, k2 = jax.random.split(key)
    return {"fc1": _torch_linear(k1, in_dim, cfg.fusion_dim),
            "fc2": _torch_linear(k2, cfg.fusion_dim, cfg.output_dims)}


def _apply_head(p, cfg, x, train, rng):
    h = jax.nn.relu(linear(p["fc1"], x))
    h = dropout(rng, h, cfg.dropout_prob, deterministic=not train)
    return linear(p["fc2"], h)


def _init_projs(key, cfg: FusionConfig):
    ks = jax.random.split(key, cfg.num_modalities)
    return {m: _torch_linear(k, cfg.feature_dims, cfg.fusion_dim)
            for m, k in zip(cfg.modality_types, ks)}


# -- mask helpers ------------------------------------------------------------

def missing_masks(cfg: FusionConfig, missing_index) -> Dict[str, jax.Array]:
    """{modality: [B] bool, True where that modality is MISSING}.

    depth/thermal carry no missing code in the benchmark (SURVEY §2:
    encoder-supported, never dropped) — code -1 never matches, so they are
    always present."""
    return {m: missing_index == MODALITY_CODES.get(m, -1)
            for m in cfg.modality_types}


def present_matrix(cfg: FusionConfig, missing_index) -> jax.Array:
    """[B, M] bool, True where present, columns in modality_types order."""
    cols = [missing_index != MODALITY_CODES.get(m, -1)
            for m in cfg.modality_types]
    return jnp.stack(cols, axis=1)


def _zero_missing(x, miss):
    return jnp.where(miss[:, None], 0.0, x)


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

def init_sum(key, cfg):
    k1, k2 = jax.random.split(key)
    return {"proj": _init_projs(k1, cfg), "norm": _ln(cfg.fusion_dim),
            "head": _init_head(k2, cfg, cfg.fusion_dim)}


def _fwd_sum(p, cfg, embeds, missing_index, train, rng):
    miss = missing_masks(cfg, missing_index)
    total = 0.0
    for m in cfg.modality_types:
        total = total + _zero_missing(linear(p["proj"][m], embeds[m]), miss[m])
    return _apply_head(p["head"], cfg, layer_norm(p["norm"], total), train,
                       rng), {}


def init_concat(key, cfg):
    k1, k2 = jax.random.split(key)
    return {
        "proj": _init_projs(k1, cfg),
        "norm": _ln(cfg.fusion_dim * cfg.num_modalities),
        "head": _init_head(k2, cfg, cfg.fusion_dim * cfg.num_modalities),
        # imputation buffers, default zeros == 'concat_zero'; filled with
        # train-set mean/median via set_statistics (reference baseline.py:74-90)
        "statistics": {m: jnp.zeros((cfg.feature_dims,))
                       for m in cfg.modality_types},
    }


def set_statistics(params, statistics: Mapping[str, jax.Array]):
    """Functional `modal_concat.set_statistics` (baseline.py:88-90)."""
    new = dict(params)
    new["statistics"] = {m: jnp.asarray(v) for m, v in statistics.items()}
    return new


def _fwd_concat(p, cfg, embeds, missing_index, train, rng):
    miss = missing_masks(cfg, missing_index)
    parts = []
    for m in cfg.modality_types:
        x = jnp.where(miss[m][:, None], p["statistics"][m][None, :],
                      embeds[m])
        parts.append(linear(p["proj"][m], x))
    cat = jnp.concatenate(parts, axis=-1)
    return _apply_head(p["head"], cfg, layer_norm(p["norm"], cat), train,
                       rng), {}


def init_regression(key, cfg):
    k1, k2, k3 = jax.random.split(key, 3)
    regs = {}
    pairs = [(s, t) for s in cfg.modality_types for t in cfg.modality_types
             if s != t]
    ks = jax.random.split(k3, len(pairs))
    for (s, t), k in zip(pairs, ks):
        regs[f"{s}_to_{t}"] = _torch_linear(k, cfg.feature_dims,
                                            cfg.fusion_dim)
    return {"proj": _init_projs(k1, cfg),
            "norm": _ln(cfg.fusion_dim * cfg.num_modalities),
            "head": _init_head(k2, cfg, cfg.fusion_dim * cfg.num_modalities),
            "regressors": regs}


def _fwd_regression(p, cfg, embeds, missing_index, train, rng):
    """Cross-modal regressors predict a missing modality's projected feature
    as the presence-weighted mean of the other modalities' predictions
    (reference baseline.py:112-149)."""
    miss = missing_masks(cfg, missing_index)
    projected = {m: linear(p["proj"][m], embeds[m])
                 for m in cfg.modality_types}
    for target in cfg.modality_types:
        preds, weights = [], []
        for source in cfg.modality_types:
            if source == target:
                continue
            preds.append(linear(p["regressors"][f"{source}_to_{target}"],
                                embeds[source]))
            weights.append(jnp.where(miss[source], 0.0, 1.0))
        preds = jnp.stack(preds, axis=1)                  # [B, S, D]
        w = jnp.stack(weights, axis=1)[:, :, None]        # [B, S, 1]
        avg = (preds * w).sum(1) / jnp.clip(w.sum(1), 1e-6)
        projected[target] = jnp.where(miss[target][:, None], avg,
                                      projected[target])
    cat = jnp.concatenate([projected[m] for m in cfg.modality_types], -1)
    return _apply_head(p["head"], cfg, layer_norm(p["norm"], cat), train,
                       rng), {}


def init_retrieval(key, cfg):
    """`modal_concat_full` — the retrieval substitution happens in the data
    layer (same-label complete sample, reference data_loader.py:67-72);
    the head itself is a plain concat (baseline.py:153-169)."""
    k1, k2 = jax.random.split(key)
    return {"proj": _init_projs(k1, cfg),
            "norm": _ln(cfg.fusion_dim * cfg.num_modalities),
            "head": _init_head(k2, cfg, cfg.fusion_dim * cfg.num_modalities)}


def _fwd_retrieval(p, cfg, embeds, missing_index, train, rng):
    cat = jnp.concatenate([linear(p["proj"][m], embeds[m])
                           for m in cfg.modality_types], -1)
    return _apply_head(p["head"], cfg, layer_norm(p["norm"], cat), train,
                       rng), {}


def init_intra_attention(key, cfg):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    d = cfg.fusion_dim
    return {
        "proj": _init_projs(k1, cfg),
        "norm": _ln(d),
        "head": _init_head(k2, cfg, d),
        "fusion_representation": jax.random.normal(k3, (1, d)),
        "gate_fc1": _torch_linear(k4, d * 2, d // 4),
        "gate_fc2": _torch_linear(k5, d // 4, d),
    }


def _fwd_intra_attention(p, cfg, embeds, missing_index, train, rng):
    """SE-style sigmoid channel gating against a learned fusion token
    (reference baseline.py:173-203)."""
    miss = missing_masks(cfg, missing_index)
    total = 0.0
    for m in cfg.modality_types:
        data = linear(p["proj"][m], embeds[m])
        B = data.shape[0]
        fused = jnp.broadcast_to(p["fusion_representation"],
                                 (B, data.shape[-1]))
        gate = jax.nn.sigmoid(linear(p["gate_fc2"], jax.nn.relu(
            linear(p["gate_fc1"], jnp.concatenate([data, fused], -1)))))
        total = total + _zero_missing(data * gate, miss[m])
    return _apply_head(p["head"], cfg, layer_norm(p["norm"], total), train,
                       rng), {}


# the reference hardcodes nn.MultiheadAttention(fusion_dim, 4)
# (baseline.py:207-236); a static constant, NOT a params leaf — an int
# leaf in the pytree breaks jax.grad (int32 input) and turns reshape
# dims into tracers under jit.
INTER_ATTN_HEADS = 4


def init_inter_attention(key, cfg):
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    d = cfg.fusion_dim
    # torch nn.MultiheadAttention init: xavier_uniform over the PACKED
    # (3d, d) in_proj -> limit sqrt(6/(3d+d)) for each of q/k/v (verified
    # vs torch: in_proj |max| 0.07655 == sqrt(6/4d) at d=256); out_proj
    # is torch-linear default with zero bias.
    limit = math.sqrt(6.0 / (3 * d + d))
    def xavier(k):
        return {"w": jax.random.uniform(k, (d, d), jnp.float32, -limit,
                                        limit),
                "b": jnp.zeros((d,))}
    return {
        "proj": _init_projs(k1, cfg),
        "norm": _ln(d),
        "head": _init_head(k2, cfg, d),
        "query_token": jax.random.normal(k3, (1, 1, d)),
        "attn": {"q": xavier(k4), "k": xavier(k5), "v": xavier(k6),
                 "out": dict(_torch_linear(k7, d, d), b=jnp.zeros((d,)))},
    }


def _fwd_inter_attention(p, cfg, embeds, missing_index, train, rng):
    """Modalities as tokens; one learned query attends over them with the
    missing mask as key-padding (reference baseline.py:207-236, 4 heads)."""
    present = present_matrix(cfg, missing_index)          # [B, M]
    tokens = jnp.stack([linear(p["proj"][m], embeds[m])
                        for m in cfg.modality_types], axis=1)  # [B, M, D]
    B, M, D = tokens.shape
    H = INTER_ATTN_HEADS
    hd = D // H
    q = linear(p["attn"]["q"], jnp.broadcast_to(p["query_token"], (B, 1, D)))
    k = linear(p["attn"]["k"], tokens)
    v = linear(p["attn"]["v"], tokens)
    q = q.reshape(B, 1, H, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
    k = k.reshape(B, M, H, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, M, H, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    neg = jnp.finfo(logits.dtype).min
    logits = jnp.where(present[:, None, None, :], logits, neg)
    a = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", a, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, D)[:, 0]
    out = linear(p["attn"]["out"], out)
    return _apply_head(p["head"], cfg, layer_norm(p["norm"], out), train,
                       rng), {}


def init_graph_fusion(key, cfg):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"proj": _init_projs(k1, cfg), "norm": _ln(cfg.fusion_dim),
            "head": _init_head(k2, cfg, cfg.fusion_dim),
            "gcn": init_fusion_gcn(k3, in_dim=cfg.fusion_dim, hidden=128,
                                   out_dim=cfg.fusion_dim, heads=4)}


def _fwd_graph_fusion(p, cfg, embeds, missing_index, train, rng):
    present = present_matrix(cfg, missing_index)
    nodes = jnp.stack([linear(p["proj"][m], embeds[m])
                       for m in cfg.modality_types], axis=1)
    adj = modality_adjacency(present)
    out = fusion_gcn_forward(p["gcn"], nodes, adj)
    pooled = out.mean(axis=1)  # mean over ALL nodes, missing included
    return _apply_head(p["head"], cfg, layer_norm(p["norm"], pooled), train,
                       rng), {}


def init_unified_graph(key, cfg):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm": _ln(cfg.fusion_dim),
        "head": _init_head(k1, cfg, cfg.fusion_dim),
        # stage 1 reconstructs 768-d features; stage 2 fuses to fusion_dim
        "complete_gcn": init_fusion_gcn(k2, in_dim=cfg.feature_dims,
                                        hidden=cfg.feature_dims // 2,
                                        out_dim=cfg.feature_dims, heads=4),
        "fusion_gcn": init_fusion_gcn(k3, in_dim=cfg.feature_dims, hidden=128,
                                      out_dim=cfg.fusion_dim, heads=4),
    }


def _fwd_unified_graph(p, cfg, embeds, missing_index, train, rng):
    """Stage-1 GCN over present modalities reconstructs the missing node's
    768-d feature; stage-2 GCN over the fully-connected graph fuses
    (reference baseline.py:294-320)."""
    present = present_matrix(cfg, missing_index)
    feats = jnp.stack([embeds[m] for m in cfg.modality_types], axis=1)
    adj1 = modality_adjacency(present)
    recon = fusion_gcn_forward(p["complete_gcn"], feats, adj1)
    filled = jnp.where(present[:, :, None], feats, recon)
    B, M, _ = filled.shape
    out = fusion_gcn_forward(p["fusion_gcn"], filled, full_adjacency(B, M))
    pooled = out.mean(axis=1)
    return _apply_head(p["head"], cfg, layer_norm(p["norm"], pooled), train,
                       rng), {}


def init_dedicated_dnn(key, cfg):
    k1, k2, k3 = jax.random.split(key, 3)
    M, C = cfg.num_modalities, cfg.feature_dims
    ks = jax.random.split(k3, M)
    branches = {m: _torch_linear(k, C * (M - 1), cfg.fusion_dim)
                for m, k in zip(cfg.modality_types, ks)}
    branches["full"] = _torch_linear(k1, C * M, cfg.fusion_dim)
    return {"branches": branches, "norm": _ln(cfg.fusion_dim),
            "head": _init_head(k2, cfg, cfg.fusion_dim)}


def _fwd_dedicated_dnn(p, cfg, embeds, missing_index, train, rng):
    """Per-sample routing to a leave-one-modality-out branch
    (reference baseline.py:346-354). All branches computed, select-by-mask —
    static shapes, no data-dependent control flow."""
    miss = missing_masks(cfg, missing_index)
    feats = jnp.stack([embeds[m] for m in cfg.modality_types], axis=1)
    B, M, C = feats.shape
    out = linear(p["branches"]["full"], feats.reshape(B, M * C))
    for i, m in enumerate(cfg.modality_types):
        rest = jnp.concatenate([feats[:, :i], feats[:, i + 1:]],
                               axis=1).reshape(B, (M - 1) * C)
        out = jnp.where(miss[m][:, None], linear(p["branches"][m], rest), out)
    return _apply_head(p["head"], cfg, layer_norm(p["norm"], out), train,
                       rng), {}


def init_distillation(key, cfg):
    k1, k2, k3 = jax.random.split(key, 3)
    M = cfg.num_modalities
    return {
        "mlp_fc1": _torch_linear(k1, cfg.feature_dims * M, cfg.fusion_dim),
        "mlp_fc2": _torch_linear(k2, cfg.fusion_dim, cfg.fusion_dim),
        "norm": _ln(cfg.fusion_dim),
        "head": _init_head(k3, cfg, cfg.fusion_dim),
    }


def _shared_mlp(p, x):
    return linear(p["mlp_fc2"], jax.nn.relu(linear(p["mlp_fc1"], x)))


def _fwd_distillation(p, cfg, embeds, missing_index, train, rng):
    """Teacher/student representation-distillation head: aux['features'] is
    the concat of zero-masked *raw* embeddings — that is what the MSE/KL
    distillation losses compare (reference baseline.py:371-380,
    train_ddp.py:232-236)."""
    miss = missing_masks(cfg, missing_index)
    feats = jnp.concatenate(
        [_zero_missing(embeds[m], miss[m]) for m in cfg.modality_types], -1)
    inputs = _shared_mlp(p, feats)
    logits = _apply_head(p["head"], cfg, layer_norm(p["norm"], inputs), train,
                         rng)
    return logits, {"features": feats}


init_self_distill = init_distillation


def _fwd_self_distill(p, cfg, embeds, missing_index, train, rng):
    """Self-distillation (reference baseline.py:397-418). Train mode returns
    aux with per-modality student views (each modality alone in its concat
    slot) and the full-concat teacher features; the 0.01-weighted KL loss is
    applied in the train step (train_ddp.py:237-244)."""
    miss = missing_masks(cfg, missing_index)
    masked = {m: _zero_missing(embeds[m], miss[m])
              for m in cfg.modality_types}
    tea_in = jnp.concatenate([masked[m] for m in cfg.modality_types], -1)
    tea = _shared_mlp(p, tea_in)
    logits = _apply_head(p["head"], cfg, layer_norm(p["norm"], tea), train,
                         rng)
    if not train:
        return logits, {}
    B, C = next(iter(masked.values())).shape
    M = cfg.num_modalities
    stu = []
    for i, m in enumerate(cfg.modality_types):
        slot = jnp.zeros((B, M * C)).at[:, i * C:(i + 1) * C].set(masked[m])
        stu.append(_shared_mlp(p, slot))
    present = present_matrix(cfg, missing_index)
    return logits, {"present_masks": present,
                    "stu_features": jnp.stack(stu, 1),
                    "tea_features": tea}


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

_INIT = {
    "sum": init_sum,
    "concat": init_concat,
    "regression": init_regression,
    "retrieval": init_retrieval,
    "intra_attention": init_intra_attention,
    "inter_attention": init_inter_attention,
    "graph_fusion": init_graph_fusion,
    "unified_graph": init_unified_graph,
    "dedicated_dnn": init_dedicated_dnn,
    "Distill_tea": init_distillation,
    "MTD_stu": init_distillation,
    "KL_stu": init_distillation,
    "self_distill": init_self_distill,
}

_FWD = {
    "sum": _fwd_sum,
    "concat": _fwd_concat,
    "regression": _fwd_regression,
    "retrieval": _fwd_retrieval,
    "intra_attention": _fwd_intra_attention,
    "inter_attention": _fwd_inter_attention,
    "graph_fusion": _fwd_graph_fusion,
    "unified_graph": _fwd_unified_graph,
    "dedicated_dnn": _fwd_dedicated_dnn,
    "Distill_tea": _fwd_distillation,
    "MTD_stu": _fwd_distillation,
    "KL_stu": _fwd_distillation,
    "self_distill": _fwd_self_distill,
}

FUSION_TYPES = tuple(_INIT)


def init_fusion(key, cfg: FusionConfig):
    return _INIT[cfg.fusion_type](key, cfg)


def fusion_forward(params, cfg: FusionConfig, embeds: Mapping[str, jax.Array],
                   missing_index, *, train: bool = False, rng=None):
    """embeds: {modality: [B, feature_dims]}; missing_index: [B] int32.
    Returns (logits [B, output_dims], aux dict)."""
    return _FWD[cfg.fusion_type](params, cfg, embeds, missing_index, train,
                                 rng)
