"""Training losses.

torch-parity notes:
- cross_entropy matches nn.CrossEntropyLoss (mean reduction, log-softmax in
  f32) — reference train_ddp.py:88.
- kl_distill_loss matches the reference `KL_loss` (train_ddp.py:70-79):
  KL(softmax(teacher/T) || softmax(student/T)) with reduction='batchmean'
  (sum over elements / batch rows), teacher detached, temperature 0.15.
- mse_loss matches nn.MSELoss mean reduction (MTD_stu, train_ddp.py:84).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def per_sample_cross_entropy(logits, labels):
    """Per-row NLL (no reduction) — lets eval mask out padded rows."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def cross_entropy(logits, labels):
    return per_sample_cross_entropy(logits, labels).mean()


def kl_distill_loss(student, teacher, temperature: float = 0.15):
    """F.kl_div(log_softmax(s/T), softmax(t/T), reduction='batchmean')."""
    s = jax.nn.log_softmax(student.astype(jnp.float32) / temperature, axis=1)
    t = jax.nn.softmax(
        jax.lax.stop_gradient(teacher).astype(jnp.float32) / temperature,
        axis=1)
    # torch kl_div with target=t, input=s: sum t*(log t - s); 0*log0 := 0
    elem = jnp.where(t > 0, t * (jnp.log(jnp.where(t > 0, t, 1.0)) - s), 0.0)
    return elem.sum() / student.shape[0]


def mse_loss(a, b):
    return jnp.mean(jnp.square(a - jax.lax.stop_gradient(b)))


def masked_mse_loss(a, b, mask):
    """nn.MSELoss mean over only the rows where `mask` is True (static
    shapes: per-row sum, masked sum / (count * row_width))."""
    sq = jnp.square(a - jax.lax.stop_gradient(b)).sum(axis=1)
    count = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, sq, 0.0).sum() / (count * a.shape[1])


def masked_kl_distill(student, teacher, mask, temperature: float = 0.15):
    """KL over only the rows where `mask` is True, batchmean over the
    selected rows (the reference indexes tensors with the boolean mask,
    train_ddp.py:240-243). Computed with static shapes: per-row KL, masked
    sum / masked count."""
    s = jax.nn.log_softmax(student.astype(jnp.float32) / temperature, axis=1)
    t = jax.nn.softmax(
        jax.lax.stop_gradient(teacher).astype(jnp.float32) / temperature,
        axis=1)
    elem = jnp.where(t > 0, t * (jnp.log(jnp.where(t > 0, t, 1.0)) - s), 0.0)
    row = elem.sum(axis=1)
    count = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, row, 0.0).sum() / count
