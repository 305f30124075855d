"""missm_tpu pytree -> HF/LanguageBind-style torch state dict (the inverse
of compat.convert), so trained towers can be loaded back into
HF/PyTorch tooling or diffed against reference checkpoints."""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.config import TowerConfig


def _np(x):
    return np.asarray(x)


def _put_linear(sd, prefix, p):
    sd[prefix + ".weight"] = _np(p["w"]).T
    if "b" in p:
        sd[prefix + ".bias"] = _np(p["b"])
    if "lora_a" in p:
        sd[prefix + ".lora_A.weight"] = _np(p["lora_a"]).T
        sd[prefix + ".lora_B.weight"] = _np(p["lora_b"]).T


def _put_ln(sd, prefix, p):
    sd[prefix + ".weight"] = _np(p["scale"])
    sd[prefix + ".bias"] = _np(p["bias"])


def _put_attn(sd, prefix, p):
    _put_linear(sd, prefix + ".q_proj", p["q"])
    _put_linear(sd, prefix + ".k_proj", p["k"])
    _put_linear(sd, prefix + ".v_proj", p["v"])
    _put_linear(sd, prefix + ".out_proj", p["out"])


def _layer_slice(tree, i):
    import jax
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def export_tower_state_dict(params, cfg: TowerConfig) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    # text
    t = params["text"]
    sd["text_model.embeddings.token_embedding.weight"] = _np(
        t["token_embedding"])
    sd["text_model.embeddings.position_embedding.weight"] = _np(
        t["position_embedding"])
    for i in range(cfg.text.num_layers):
        b = _layer_slice(t["blocks"], i)
        lp = f"text_model.encoder.layers.{i}."
        _put_ln(sd, lp + "layer_norm1", b["ln1"])
        _put_ln(sd, lp + "layer_norm2", b["ln2"])
        _put_attn(sd, lp + "self_attn", b["attn"])
        _put_linear(sd, lp + "mlp.fc1", b["mlp"]["fc1"])
        _put_linear(sd, lp + "mlp.fc2", b["mlp"]["fc2"])
    _put_ln(sd, "text_model.final_layer_norm", t["final_ln"])

    # vision
    v = params["vision"]
    vc = cfg.vision
    sd["vision_model.embeddings.class_embedding"] = _np(v["class_embedding"])
    pw = _np(v["patch_embedding"]["w"]).T
    if vc.use_tube3d:
        pw = pw.reshape(-1, vc.num_channels, vc.tube_size, vc.patch_size,
                        vc.patch_size)
    else:
        pw = pw.reshape(-1, vc.num_channels, vc.patch_size, vc.patch_size)
    sd["vision_model.embeddings.patch_embedding.weight"] = pw
    sd["vision_model.embeddings.position_embedding.weight"] = _np(
        v["position_embedding"])
    _put_ln(sd, "vision_model.pre_layrnorm", v["pre_ln"])
    _put_ln(sd, "vision_model.post_layernorm", v["post_ln"])
    for i in range(vc.num_layers):
        b = _layer_slice(v["blocks"], i)
        lp = f"vision_model.encoder.layers.{i}."
        _put_ln(sd, lp + "layer_norm1", b["ln1"])
        _put_ln(sd, lp + "layer_norm2", b["ln2"])
        _put_attn(sd, lp + "self_attn", b["attn"])
        _put_linear(sd, lp + "mlp.fc1", b["mlp"]["fc1"])
        _put_linear(sd, lp + "mlp.fc2", b["mlp"]["fc2"])
        if "tattn" in b:
            te = _np(b["temporal_embedding"])
            sd[lp + "temporal_embedding"] = te[None]
            _put_ln(sd, lp + "temporal_layer_norm1", b["tln1"])
            _put_attn(sd, lp + "temporal_attn", b["tattn"])
            if "tmlp" in b:
                _put_ln(sd, lp + "temporal_layer_norm2", b["tln2"])
                _put_linear(sd, lp + "temporal_mlp.fc1", b["tmlp"]["fc1"])
                _put_linear(sd, lp + "temporal_mlp.fc2", b["tmlp"]["fc2"])

    _put_linear(sd, "visual_projection", params["visual_projection"])
    _put_linear(sd, "text_projection", params["text_projection"])
    sd["logit_scale"] = _np(params["logit_scale"])
    return sd
