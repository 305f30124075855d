"""Jitted train / eval steps.

The TPU-native equivalent of the reference's DDP loop body
(train_ddp.py:220-259): one jitted function computes forward, loss (incl.
the distillation variants), gradients, the Adam update, and — for MTD — the
EMA teacher update. Data parallelism comes from sharding the batch over the
mesh's `data` axis; with replicated params, XLA inserts the gradient
all-reduce automatically (the NCCL-allreduce equivalent rides ICI).

Teacher semantics (faithfully preserved from the reference): the teacher
model *shares the encoder object* with the student
(`finetune_model(args, dims, encoder_model)` twice with the same encoder,
train_ddp.py:187,192), so only the fusion params are teacher-specific; the
MTD EMA update (train_ddp.py:256-259) is therefore a no-op on encoder params
and only moves the teacher's fusion params.

Learning rate is a traced scalar argument (no recompdue to plateau decay).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.finetune import ModelConfig, model_forward
from .losses import (cross_entropy, kl_distill_loss, masked_kl_distill,
                     masked_mse_loss, mse_loss, per_sample_cross_entropy)
from .trainability import TRAIN, param_labels


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    teacher_fusion: Any  # None unless MTD_stu / KL_stu
    step: jax.Array


def partition_trainable(params, cfg: ModelConfig):
    """Split `params` into (treedef, trainable, frozen) where trainable /
    frozen are flat leaf lists with `None` in the other side's slots (each a
    valid pytree). The train step differentiates ONLY the trainable list:
    frozen leaves enter the loss as non-differentiated constants, so JAX's
    scan transpose never emits their dW cotangent matmuls — the TPU
    equivalent of torch autograd skipping `requires_grad=False` weights
    (peft freeze, reference image/modeling_image.py:775-793). For the
    LoRA-frozen ViT the spatial MLP (2/3 of block matmul FLOPs) carries no
    LoRA, so its xT@dy products vanish from the backward entirely."""
    labels = param_labels(params, cfg)
    p_flat, treedef = jax.tree_util.tree_flatten(params)
    l_flat = jax.tree_util.tree_flatten(labels)[0]
    trainable = [p if l == TRAIN else None for p, l in zip(p_flat, l_flat)]
    frozen = [None if l == TRAIN else p for p, l in zip(p_flat, l_flat)]
    return treedef, trainable, frozen


def combine_params(treedef, trainable, frozen):
    return treedef.unflatten([f if t is None else t
                              for t, f in zip(trainable, frozen)])


def make_optimizer(params, cfg: ModelConfig, *, b1=0.9, b2=0.999, eps=1e-8,
                   weight_decay: float = 0.0):
    """torch.optim.Adam equivalence: L2 weight decay added to the gradient
    before the moment updates (train_ddp.py:205). The transform runs on the
    trainable partition only — frozen (peft-base) params are never
    differentiated nor updated, mirroring the reference's
    `Adam(filter(lambda p: p.requires_grad, ...))` construction."""
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    return optax.chain(*chain)


def init_train_state(params, cfg: ModelConfig, *, weight_decay: float = 0.0,
                     teacher_fusion=None) -> tuple[TrainState, Any]:
    tx = make_optimizer(params, cfg, weight_decay=weight_decay)
    _, trainable, _ = partition_trainable(params, cfg)
    state = TrainState(params=params, opt_state=tx.init(trainable),
                       teacher_fusion=teacher_fusion,
                       step=jnp.zeros((), jnp.int32))
    return state, tx


def compute_loss(params, teacher_fusion, cfg: ModelConfig, data, labels,
                 missing_index, rng, valid=None):
    """Returns (loss, logits). Encodes the fusion-type-specific losses of
    train_ddp.py:232-250.

    `valid` is an optional boolean [B] row mask: rows the static-shape
    batcher padded in (repeats of the last real row) are excluded from
    every loss term, so the short final batch trains on exactly its real
    rows — the reference trains the short batch unpadded, and an
    unmasked mean would hand the repeated row most of that step's
    gradient."""
    ft = cfg.fusion.fusion_type
    logits, aux = model_forward(params, cfg, data, missing_index, train=True,
                                rng=rng)
    if valid is None:
        ce = cross_entropy(logits, labels)
    else:
        nll = per_sample_cross_entropy(logits, labels)
        w = valid.astype(nll.dtype)
        ce = (nll * w).sum() / jnp.maximum(w.sum(), 1.0)

    if ft in ("MTD_stu", "KL_stu"):
        tea_params = {"encoder": params["encoder"], "fusion": teacher_fusion}
        _, tea_aux = model_forward(
            jax.lax.stop_gradient(tea_params), cfg, data,
            jnp.zeros_like(missing_index), train=False)
        rep_s, rep_t = aux["features"], tea_aux["features"]
        if valid is None:
            dl = (mse_loss(rep_s, rep_t) if ft == "MTD_stu"
                  else kl_distill_loss(rep_s, rep_t))
        else:
            dl = (masked_mse_loss(rep_s, rep_t, valid) if ft == "MTD_stu"
                  else masked_kl_distill(rep_s, rep_t, valid,
                                         temperature=0.15))
        return dl + ce, logits

    if ft == "self_distill":
        present = aux["present_masks"]                    # [B, M]
        stu = aux["stu_features"]                         # [B, M, D]
        tea = aux["tea_features"]                         # [B, D]
        M = present.shape[1]
        dl = 0.0
        for i in range(M):
            mask = (present[:, i] if valid is None
                    else jnp.logical_and(present[:, i], valid))
            dl = dl + masked_kl_distill(stu[:, i], tea, mask)
        return 0.01 * dl / M + ce, logits

    return ce, logits


def make_train_step(cfg: ModelConfig, tx, accum_steps: int = 1):
    """Returns jitted step(state, batch, lr, rng) -> (state, metrics).

    accum_steps > 1 enables gradient accumulation: the batch is split
    into `accum_steps` equal microbatches scanned INSIDE the jitted step
    (one dispatch, one Adam update), so only one microbatch's
    activations are live at a time — effective batch sizes whose
    activations exceed HBM (docs/PERF.md train3 remat sweeps) train
    without leaving the device. The CE loss matches the full-batch
    masked mean exactly (per-microbatch means recombined with
    valid-row-count weights); distillation terms whose
    normalizers are data-dependent (self_distill's masked KL) become
    valid-count-weighted means of per-microbatch means — same as
    running the microbatches as separate valid-weighted steps. Each microbatch draws its own dropout rng. Not in
    the reference (whose A100-80GB never needed it)."""

    ema_decay = 0.999 if cfg.fusion.fusion_type == "MTD_stu" else None

    def step_fn(state: TrainState, data, labels, missing_index, lr, rng,
                valid=None):
        treedef, trainable, frozen = partition_trainable(state.params, cfg)

        def loss_fn(trainable, data, labels, missing_index, rng, valid):
            params = combine_params(treedef, trainable, frozen)
            return compute_loss(params, state.teacher_fusion, cfg, data,
                                labels, missing_index, rng, valid=valid)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum_steps == 1:
            (loss, logits), grads = grad_fn(trainable, data, labels,
                                            missing_index, rng, valid)
        else:
            A = accum_steps
            assert labels.shape[0] % A == 0, (
                f"batch {labels.shape[0]} not divisible by "
                f"accum_steps {A}")

            def split(x):
                return x.reshape((A, x.shape[0] // A) + x.shape[1:])

            if valid is None:
                valid = jnp.ones(labels.shape[0], bool)
            micro = (jax.tree_util.tree_map(split, dict(data)),
                     split(labels), split(missing_index),
                     jax.random.split(rng, A), split(valid))
            zeros = jax.tree_util.tree_map(jnp.zeros_like, trainable)

            # each microbatch's loss/grads are means over ITS valid rows;
            # weight by that row count so the combined step equals the
            # full-batch masked mean (equal 1/A weights would over-weight
            # real rows in a sparse final microbatch and let an all-padded
            # microbatch dilute the update — the padded-row pathology the
            # `valid` mask exists to prevent). With no padding every
            # weight is B/A and this reduces to the plain mean.
            def body(carry, xs):
                g_acc, l_acc, w_acc = carry
                w = xs[-1].sum().astype(jnp.float32)
                (l, _), g = grad_fn(trainable, *xs)
                g_acc = jax.tree_util.tree_map(
                    lambda a, b: a + w * b, g_acc, g)
                return (g_acc, l_acc + w * l, w_acc + w), None

            (g_sum, l_sum, w_sum), _ = jax.lax.scan(
                body, (zeros, jnp.zeros((), jnp.float32),
                       jnp.zeros((), jnp.float32)), micro)
            denom = jnp.maximum(w_sum, 1.0)
            grads = jax.tree_util.tree_map(lambda g: g / denom, g_sum)
            loss = l_sum / denom
        updates, new_opt = tx.update(grads, state.opt_state, trainable)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        new_trainable = optax.apply_updates(trainable, updates)
        new_params = combine_params(treedef, new_trainable, frozen)

        teacher = state.teacher_fusion
        if ema_decay is not None:
            teacher = jax.tree_util.tree_map(
                lambda t, s: t * ema_decay + s * (1.0 - ema_decay),
                teacher, new_params["fusion"])

        new_state = TrainState(params=new_params, opt_state=new_opt,
                               teacher_fusion=teacher, step=state.step + 1)
        return new_state, {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(cfg: ModelConfig):
    """Returns jitted eval(params, data, labels, missing_index[, valid]) ->
    dict(loss, loss_sum, count, preds, probs) — the body of `evaluate`
    (train_ddp.py:98-125) / the test sweep inner loop (test.py:131-154).

    `valid` is an optional boolean [B] mask: rows padded in by the
    static-shape batcher are excluded from the loss (the reference never
    pads, so its batch-mean loss covers only real rows — this reproduces
    that with static shapes). `loss_sum`/`count` let multi-host callers
    combine the masked mean exactly across processes."""

    def eval_fn(params, data, labels, missing_index, valid=None):
        logits, _ = model_forward(params, cfg, data, missing_index,
                                  train=False)
        nll = per_sample_cross_entropy(logits, labels)
        if valid is None:
            loss_sum = nll.sum()
            count = jnp.asarray(nll.shape[0], jnp.float32)
        else:
            v = valid.astype(nll.dtype)
            loss_sum = (nll * v).sum()
            count = v.sum()
        loss = loss_sum / jnp.maximum(count, 1.0)
        probs = jax.nn.softmax(logits, axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        return {"loss": loss, "loss_sum": loss_sum, "count": count,
                "preds": preds, "probs": probs}

    return jax.jit(eval_fn)
