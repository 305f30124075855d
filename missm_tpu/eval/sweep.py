"""Evaluation: per-loader metric pass, train-set statistics pass, and the
missing-type x missing-ratio sweep with reference-format txt reports.

Mirrors test.py:64-173. Report blocks are byte-identical to the reference
writer (test.py:164-171) so eval artifacts diff cleanly.

Quirk preserved (flagged): the reference normalizes test loss by
`len(test_loader)` — the number of *missing types*, not batches
(test.py:158). `loss_normalizer='reference'` reproduces that;
'batches' gives the sane normalization.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Mapping

import numpy as np
import jax
import jax.numpy as jnp

from ..metrics import compute_metrics
from ..models.finetune import ModelConfig, embed_only
from ..models.fusion import set_statistics


def _pad_batch(tree, target: int):
    """Pad every leaf's batch dim to `target` by repeating the last row —
    keeps the jitted eval step at one static batch shape."""
    def pad(x):
        n = x.shape[0]
        if n == target:
            return x
        reps = np.repeat(x[-1:], target - n, axis=0)
        return np.concatenate([x, reps], axis=0)
    return jax.tree_util.tree_map(pad, tree)


def evaluate_loader(params, eval_step, loader, *, batch_size=None,
                    device_put: Callable = lambda x: x):
    """Run the jitted eval step over a BatchLoader; returns
    (metrics dict incl. summed loss, labels, preds, probs). Host decode and
    device transfer run ahead in a prefetch thread."""
    from ..utils.prefetch import prefetch

    target = batch_size or loader.batch_size

    def prepared():
        row = 0
        for data, labels, missing in loader:
            b = len(labels)
            # rows past the shard's real count are DistributedSampler-
            # style wrap-around duplicates (loaders.py:_shard_indices,
            # always at the shard tail): exclude them from the loss AND
            # the gathered preds/labels, so metrics cover exactly the
            # dataset — the reference gathers the duplicates
            # (train_ddp.py:64-67), a documented defect we fix.
            real = getattr(loader, "shard_real_count", None)
            n = b if real is None else max(0, min(b, real - row))
            row += b
            data, labels_p, missing_p = _pad_batch((data, labels, missing),
                                                   target)
            # mask built host-side and passed as a traced array — one jit
            # signature for every partial-batch size
            valid = jnp.asarray(np.arange(target) < n)
            yield (n, labels[:n], device_put(data), jnp.asarray(labels_p),
                   jnp.asarray(missing_p), valid)

    multihost = jax.process_count() > 1
    losses = []
    all_labels, all_preds, all_probs = [], [], []
    for n, labels, data, labels_p, missing_p, valid in prefetch(prepared(), 2):
        out = eval_step(params, data, labels_p, missing_p, valid=valid)
        if multihost:
            # each host sees its own sampler shard; gather preds/probs AND
            # the matching labels + per-host valid counts so pairing stays
            # host-by-host (the reference's gather_tensor equivalent,
            # train_ddp.py:64-67, minus the wrap-around duplicates). The
            # batch loss is the global masked mean from summed
            # (loss_sum, count).
            from jax.experimental import multihost_utils
            g = multihost_utils.process_allgather(
                {"preds": out["preds"], "probs": out["probs"],
                 "loss_sum": out["loss_sum"], "count": out["count"],
                 "labels": labels_p, "n": jnp.int32(n)})
            total = float(np.sum(g["count"]))
            if total > 0:
                # a batch index where EVERY host held only wrap-around
                # duplicates has no real rows — appending its 0.0 "loss"
                # would deflate the batch-mean val loss
                losses.append(float(np.sum(g["loss_sum"])) / total)
            ns = np.asarray(g["n"])
            for p in range(ns.shape[0]):
                n_p = int(ns[p])
                all_preds.append(np.asarray(g["preds"][p])[:n_p])
                all_probs.append(np.asarray(g["probs"][p])[:n_p])
                all_labels.append(np.asarray(g["labels"][p])[:n_p])
        elif n > 0:
            # n == 0 means the whole batch is wrap-around duplicates
            # (possible when a sharded loader runs in one process, e.g.
            # tests); its masked loss is 0/0 -> 0.0 and would deflate
            # the batch-mean val loss, so skip it entirely
            losses.append(float(out["loss"]))
            all_preds.append(np.asarray(out["preds"])[:n])
            all_probs.append(np.asarray(out["probs"])[:n])
            all_labels.append(labels)
    if not all_labels:
        raise ValueError(
            "evaluate_loader: loader produced no batches (empty split, or "
            "a shard with zero samples) — nothing to evaluate")
    labels = np.concatenate(all_labels)
    preds = np.concatenate(all_preds)
    probs = np.concatenate(all_probs)
    return losses, labels, preds, probs


def evaluate_metrics(params, eval_step, loader, **kw):
    """The reference `evaluate` (train_ddp.py:91-135): mean batch loss +
    accuracy / macro-F1 / AUC-ovo."""
    losses, labels, preds, probs = evaluate_loader(params, eval_step, loader,
                                                   **kw)
    return compute_metrics(labels, preds, probs,
                           loss=float(np.sum(losses) / max(len(losses), 1)))


def statistics_pass(params, cfg: ModelConfig, train_loader, stat_type: str,
                    device_put: Callable = lambda x: x) -> Dict[str, np.ndarray]:
    """Full train-set embedding pass -> per-modality mean or median
    (test.py:98-115 + calculate_statistics:54-61)."""
    mods = cfg.fusion.modality_types
    buf = {m: [] for m in mods}
    target = train_loader.batch_size

    @jax.jit
    def embed(p, data):
        return embed_only(p, cfg, data)

    for data, _, _ in train_loader:
        # pad the final partial batch to the one static shape (rows
        # sliced back off below) — an odd-shaped last batch would trace
        # and compile the ViT encoder a SECOND time (1-4 min through the
        # axon tunnel)
        n = jax.tree_util.tree_leaves(data)[0].shape[0]
        out = embed(params, device_put(_pad_batch(data, target)))
        for m in mods:
            buf[m].append(np.asarray(out[m])[:n])
    agg = np.mean if stat_type == "mean" else np.median
    return {m: agg(np.concatenate(buf[m], axis=0), axis=0) for m in mods}


def format_report_block(ratio, metrics: Mapping[str, float]) -> str:
    """Byte-identical to test.py:164-171."""
    return (f"Testing with missing ratio: {ratio}\n"
            "Test Results:\n"
            f"Test Loss: {metrics['loss']:.4f}\n"
            f"Test Accuracy: {metrics['accuracy']:.4f}\n"
            f"Test F1 Score: {metrics['f1']:.4f}\n"
            f"Test AUC: {metrics['auc']:.4f}\n"
            "\n")


def run_missing_sweep(params, cfg: ModelConfig, eval_step, test_loaders,
                      out_dir: str, dataset_name: str, test_type: str, *,
                      train_loader=None, device_put: Callable = lambda x: x,
                      loss_normalizer: str = "reference",
                      verbose: bool = True):
    """The sweep of test.py:97-171. For concat_mean / concat_median the
    train-set statistics pass fills the imputation buffers first.
    Returns {missing_type: {ratio: metrics}} and writes the txt reports."""
    os.makedirs(out_dir, exist_ok=True)

    if test_type in ("concat_mean", "concat_median"):
        if train_loader is None:
            raise ValueError(f"{test_type} needs a train_loader for the "
                             "statistics pass")
        stats = statistics_pass(params, cfg, train_loader,
                                "mean" if test_type == "concat_mean"
                                else "median", device_put)
        params = dict(params,
                      fusion=set_statistics(params["fusion"], stats))

    n_types = len(test_loaders)
    results: Dict[str, Dict[float, dict]] = {}
    for missing_type, per_ratio in test_loaders.items():
        name = f"{dataset_name}_{test_type}_{missing_type}"
        results[missing_type] = {}
        with open(os.path.join(out_dir, f"{name}.txt"), "w",
                  encoding="utf-8") as fout:
            for ratio, loader in per_ratio.items():
                losses, labels, preds, probs = evaluate_loader(
                    params, eval_step, loader, device_put=device_put)
                denom = (n_types if loss_normalizer == "reference"
                         else max(len(losses), 1))
                metrics = compute_metrics(
                    labels, preds, probs,
                    loss=float(np.sum(losses) / denom))
                results[missing_type][ratio] = metrics
                fout.write(format_report_block(ratio, metrics))
                if verbose:
                    print(f"[{name}] ratio={ratio} "
                          f"acc={metrics['accuracy']:.4f} "
                          f"f1={metrics['f1']:.4f} auc={metrics['auc']:.4f}")
    return results
