"""Contrastive (CLIP) objective for the dual towers.

Each reference tower exposes a contrastive forward with `clip_loss`
(image/modeling_image.py:941-1030, loss at :1016): symmetric cross-entropy
over the text->image similarity matrix. Provided here for tower pretraining
/ fine-tuning workflows; the benchmark harness itself trains classifiers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..train.losses import cross_entropy


def clip_loss(logits_per_text) -> jax.Array:
    """(CE(rows) + CE(cols)) / 2 with diagonal targets — HF `clip_loss`."""
    n = logits_per_text.shape[0]
    labels = jnp.arange(n)
    caption_loss = cross_entropy(logits_per_text, labels)
    image_loss = cross_entropy(logits_per_text.T, labels)
    return (caption_loss + image_loss) / 2.0
