"""Trainable-vs-frozen parameter partitioning.

Mirrors the reference's peft semantics: `get_peft_model` wraps each vision
tower's *encoder* (the transformer blocks) and freezes every wrapped base
parameter, leaving only the LoRA A/B matrices trainable inside the blocks
(reference image/modeling_image.py:775-793). Everything outside the wrapped
encoder — patch/class/position embeddings, pre/post LN, text tower,
projections, logit scale, and the whole fusion head — stays trainable.
With lora_r == 0 nothing is frozen (convert_to_lora returns early)."""
from __future__ import annotations

import jax

from ..models.finetune import ModelConfig

TRAIN = "train"
FROZEN = "frozen"


def param_labels(params, cfg: ModelConfig):
    """A pytree of {'train','frozen'} labels matching `params` structure,
    consumed by `train.step.partition_trainable` (frozen leaves are excluded
    from differentiation and from the optimizer entirely)."""

    def label_tree(tree, label):
        return jax.tree_util.tree_map(lambda _: label, tree)

    labels = label_tree(params, TRAIN)
    towers = cfg.tower_dict
    for mod, tcfg in towers.items():
        if tcfg.vision.lora_r == 0:
            continue
        blocks = params["encoder"][mod]["vision"]["blocks"]

        def label_blocks(tree):
            # freeze everything except lora_a / lora_b leaves
            def walk(sub):
                if isinstance(sub, dict):
                    return {k: (TRAIN if k in ("lora_a", "lora_b")
                                else walk(v)) for k, v in sub.items()}
                return FROZEN
            return walk(tree)

        labels["encoder"][mod]["vision"]["blocks"] = label_blocks(blocks)
    return labels


def cast_frozen_params(params, cfg: ModelConfig, dtype="bfloat16"):
    """Store the FROZEN partition's floating leaves in `dtype` (--frozen_bf16).

    Bit-identical under bf16 compute: model_forward casts the whole encoder
    tree to the compute dtype inside jit anyway (finetune.py::_cast_tree),
    so a frozen leaf stored bf16 yields exactly the same cast value — this
    only drops the f32 master copy nobody reads (~1.2 GB per frozen ViT-L
    tower), buying HBM headroom for richer remat policies (docs/PERF.md,
    train3 save_attn_mlp_qkv). Only valid when cfg.compute_dtype matches:
    in f32 compute mode the frozen weights ARE read at f32 and the cast
    would change numerics, so this raises instead.
    """
    import jax.numpy as jnp
    if cfg.compute_dtype != str(jnp.dtype(dtype)):
        raise ValueError(
            f"cast_frozen_params({dtype}) requires compute_dtype={dtype}; "
            f"got {cfg.compute_dtype} — the forward would read the frozen "
            "weights at reduced precision instead of just storing them so.")
    labels = param_labels(params, cfg)

    def cast(leaf, label):
        if label == FROZEN and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(cast, params, labels)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def count_trainable(params, labels) -> int:
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_l = {tuple(str(k) for k in path): v
              for path, v in jax.tree_util.tree_leaves_with_path(labels)}
    total = 0
    for path, leaf in flat_p:
        key = tuple(str(k) for k in path)
        if flat_l.get(key) == TRAIN:
            total += leaf.size
    return total
