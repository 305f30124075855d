"""Multi-tower encoder — the LanguageBind wrapper equivalent.

Replaces `LanguageBind` (reference languagebind/__init__.py:54-85): a dict of
per-modality vision towers + projections + logit scales, and a language tower
that is *shared with the last-constructed modality tower* (the reference's
ordering-sensitive behavior at __init__.py:69-70, preserved explicitly).

forward: {modality: batch} -> {modality: L2-normalized 768-d embeddings};
non-language embeddings are scaled by exp(logit_scale)
(__init__.py:75-85).
"""
from __future__ import annotations

from typing import Dict, Mapping, Sequence

import jax
import jax.numpy as jnp

from ..core.config import TowerConfig
from ..ops.basic import l2_normalize
from .tower import init_tower_params, text_features, vision_features


def init_encoder_params(key, tower_cfgs: Mapping[str, TowerConfig],
                        dtype=jnp.float32):
    """tower_cfgs: ordered {modality: TowerConfig} for the non-language
    modalities ('image', 'video', 'audio', 'depth', 'thermal' subset).
    The language branch shares the text tower of the LAST entry."""
    mods = list(tower_cfgs)
    keys = jax.random.split(key, len(mods))
    towers = {m: init_tower_params(k, tower_cfgs[m], dtype)
              for m, k in zip(mods, keys)}
    return build_encoder_params(towers, mods)


def build_encoder_params(towers: Dict[str, dict], order: Sequence[str]):
    """Assemble encoder params from full dual-tower params.

    The language encoder aliases the text tower of order[-1] — matching the
    reference, where `self.modality_encoder['language']` is whatever model the
    loop loaded last (languagebind/__init__.py:69-70).
    """
    enc = {}
    for m in order:
        enc[m] = {
            "vision": towers[m]["vision"],
            "proj": towers[m]["visual_projection"],
            "logit_scale": towers[m]["logit_scale"],
        }
    last = order[-1]
    enc["language"] = {
        "text": towers[last]["text"],
        "proj": towers[last]["text_projection"],
    }
    return enc


def to_device(x: Mapping, device=None):
    """API-parity helper (reference languagebind/__init__.py:87-89): move a
    dict of arrays to a device (default device when None)."""
    import jax
    return {k: jax.device_put(v, device) for k, v in x.items()}


def _remat_for(remat, modality):
    """Resolve a remat spec for one tower. `remat` is either a single
    policy (bool / policy-name string, applied to every tower) or a
    per-modality spec — a Mapping or tuple of (modality, policy) pairs,
    with an optional 'default' entry — because the policy economics
    differ per tower (docs/PERF.md: save_attn_mlp wins for the image
    tower but save_attn_mlp_kern regresses at video instance counts)."""
    if isinstance(remat, tuple) and remat and isinstance(remat[0], tuple):
        remat = dict(remat)
    if isinstance(remat, Mapping):
        # towers a partial spec doesn't name inherit full remat (True) —
        # the CLI default — not False: silently disabling remat on an
        # unnamed tower OOMs ViT-L workloads (docs/PERF.md).
        return remat.get(modality, remat.get("default", True))
    return remat


def encode(params, tower_cfgs: Mapping[str, TowerConfig], inputs: Mapping,
           *, use_temp: bool = True, train: bool = False, rng=None,
           remat: bool = False, pipe=None) -> Dict[str, jax.Array]:
    """inputs: {'language': input_ids [B, L]} and/or
    {modality: pixel_values [B, C, H, W] / [B, C, T, H, W]}.

    Returns {modality: [B, projection_dim]} embeddings. Every present input
    is encoded; missing-modality masking is a *post-encoder* operation in the
    fusion heads (the reference's key invariant — SURVEY §3.4).

    `remat` may be a single policy or a per-modality spec (see _remat_for).
    """
    out = {}
    any_cfg = next(iter(tower_cfgs.values()))
    for name, value in inputs.items():
        if name == "language":
            if isinstance(value, Mapping):
                ids = value["input_ids"]
                am = value.get("attention_mask")
            else:
                ids, am = value, None
            _, pooled = text_features(params["language"]["text"],
                                      any_cfg.text, ids, am,
                                      remat=_remat_for(remat, "language"),
                                      projection=params["language"]["proj"],
                                      pipe=pipe)
            out[name] = l2_normalize(pooled)
        else:
            cfg = tower_cfgs[name]
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            pooled = vision_features(params[name]["vision"], cfg.vision,
                                     value, train=train, rng=sub,
                                     remat=_remat_for(remat, name),
                                     projection=params[name]["proj"],
                                     pipe=pipe)
            pooled = l2_normalize(pooled)
            if use_temp:
                pooled = pooled * jnp.exp(params[name]["logit_scale"])
            out[name] = pooled
    return out
