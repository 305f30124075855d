"""The full benchmark model: multi-tower encoder + fusion head.

Equivalent of the reference `finetune_model` (baseline.py:421-453):
`forward(data, missing_index)` encodes every present modality input and
dispatches to the configured fusion head. Pure/functional; the whole forward
(5 ViT towers + fusion) is one jittable graph.
"""
from __future__ import annotations

import dataclasses
from typing import Mapping, Tuple

import jax
import jax.numpy as jnp

from ..core.config import TowerConfig
from .encoder import encode, init_encoder_params
from .fusion import FusionConfig, fusion_forward, init_fusion


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static config for encoder + fusion. `towers` maps each non-language
    modality to its TowerConfig, ordered (the language tower aliases the last
    entry's text tower). Hashable, so jit can close over it.

    compute_dtype: 'bfloat16' runs the tower matmuls in bf16 (params stay
    f32 for Adam; the cast happens inside the jitted graph, accumulation is
    f32 via preferred_element_type). 'float32' for parity tests."""
    towers: Tuple[Tuple[str, TowerConfig], ...]
    fusion: FusionConfig
    use_temp: bool = True
    # True/'save_attn'/'save_attn_mlp'/'save_attn_mlp_kern'/'save_most',
    # or a per-modality tuple of (modality, policy) pairs with optional
    # 'default' (encoder._remat_for) — policy economics differ per tower.
    remat: bool | str | tuple = False
    compute_dtype: str = "float32"
    # parallel.pipeline.PipeConfig for GPipe pipeline parallelism over the
    # scanned block stacks (None = plain scan). Hashable, so jit can close
    # over the config as usual.
    pipe: object | None = None

    @property
    def tower_dict(self):
        return dict(self.towers)


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def _dequantize(x, dtype):
    """uint8 media batch (--uint8_upload; ops.image_transforms.*_host_u8)
    -> normalized CLIP input. Channel axis: 1 for the [B,3,H,W] /
    [B,3,T,H,W] layouts, 4 for the 7-D retrieval-pair layout
    (image/modeling_image.py:630-634). Normalize runs f32 then casts so
    the only delta vs the f32 path is the post-resize rounding (max
    0.5/255 of dynamic range — below bf16 input rounding)."""
    from ..ops.image_transforms import OPENAI_MEAN, OPENAI_STD
    c_axis = 4 if x.ndim == 7 else 1
    shape = tuple(3 if i == c_axis else 1 for i in range(x.ndim))
    mean = jnp.asarray(OPENAI_MEAN, jnp.float32).reshape(shape)
    std = jnp.asarray(OPENAI_STD, jnp.float32).reshape(shape)
    return ((x.astype(jnp.float32) / 255.0 - mean) / std).astype(dtype)


def _dequantize_tree(data: Mapping, dtype):
    """Dequantize any uint8 media entries (--uint8_upload) in a data
    dict; language ids and already-float media pass through."""
    return {k: (_dequantize(v, dtype)
                if k != "language" and getattr(v, "dtype", None) == jnp.uint8
                else v)
            for k, v in data.items()}


def init_model_params(key, cfg: ModelConfig):
    k1, k2 = jax.random.split(key)
    return {
        "encoder": init_encoder_params(k1, cfg.tower_dict),
        "fusion": init_fusion(k2, cfg.fusion),
    }


def model_forward(params, cfg: ModelConfig, data: Mapping, missing_index, *,
                  train: bool = False, rng=None):
    """data: {'language': ids [B,L]} | {modality: pixels}; returns
    (logits, aux) — aux carries the distillation extras."""
    r_enc = r_fus = None
    if rng is not None:
        r_enc, r_fus = jax.random.split(rng)
    enc_params = params["encoder"]
    dt = jnp.dtype(cfg.compute_dtype)
    data = _dequantize_tree(data, dt)
    if cfg.compute_dtype != "float32":
        enc_params = _cast_tree(enc_params, dt)
        data = {k: (_cast_tree(v, dt) if k != "language" else v)
                for k, v in data.items()}
    embeds = encode(enc_params, cfg.tower_dict, data,
                    use_temp=cfg.use_temp, train=train, rng=r_enc,
                    remat=cfg.remat, pipe=cfg.pipe)
    # fusion heads always run f32 (small; the reference trains them in f32)
    embeds = {k: v.astype(jnp.float32) for k, v in embeds.items()}
    return fusion_forward(params["fusion"], cfg.fusion, embeds, missing_index,
                          train=train, rng=r_fus)


def embed_only(params, cfg: ModelConfig, data: Mapping):
    """Encoder-only pass (the statistics pass of test.py:98-115). Threads
    cfg.pipe like model_forward: under --mesh_pipe the block params are
    stage-sharded, and an unpipelined scan would make GSPMD all-gather
    every stage's layers onto every device.

    Runs the encoder at cfg.compute_dtype exactly like model_forward (and
    returns f32 embeddings like model_forward hands the fusion head): the
    statistic buffers impute EVAL-time embeddings, so they must be
    computed under the precision eval actually sees — and the cast is
    what keeps --frozen_bf16 storage bit-identical on this path too (a
    stored-dtype read here would consult the f32 masters the flag drops).
    """
    dt = jnp.dtype(cfg.compute_dtype)
    enc_params = params["encoder"]
    data = _dequantize_tree(data, dt)
    if cfg.compute_dtype != "float32":
        enc_params = _cast_tree(enc_params, dt)
        data = {k: (_cast_tree(v, dt) if k != "language" else v)
                for k, v in data.items()}
    embeds = encode(enc_params, cfg.tower_dict, data,
                    use_temp=cfg.use_temp, pipe=cfg.pipe)
    return {k: v.astype(jnp.float32) for k, v in embeds.items()}
