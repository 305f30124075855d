"""FSDP memory accounting for the flagship 3-tower model (video + audio +
language — the reference's AVE training workload, train_ddp.py:215-259).

Analytic, via jax.eval_shape: no device memory is touched. For each data-
axis size we apply the production partition specs (parallel/partitioning
.py::param_pspecs) and sum the per-device bytes of params + the trainable
partition's Adam moments (2x trainable, train/step.py::make_optimizer).
Leaves whose spec carries no 'data' entry are replicated (full size per
device); sharded leaves contribute size / n_data.

Run on any host: python scripts/fsdp_memory_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from missm_tpu.core.config import languagebind_large
from missm_tpu.models.finetune import ModelConfig, init_model_params
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.parallel.partitioning import DATA_AXIS, param_pspecs
from missm_tpu.train.step import partition_trainable

towers = (("video", languagebind_large("video")),
          ("audio", languagebind_large("audio")))
fusion = FusionConfig(fusion_type="sum",
                      modality_types=("language", "video", "audio"),
                      output_dims=28, feature_dims=768, fusion_dim=256)
cfg = ModelConfig(towers=towers, fusion=fusion, remat="save_attn_mlp")

params = jax.eval_shape(
    lambda k: init_model_params(k, cfg), jax.random.PRNGKey(0))
# sizes below are for the f32 init tree (halve the tower rows under the
# production --bf16 cast); Adam moments exist only for the trainable
# partition and keep each leaf's dtype (optax scale_by_adam zeros_like)
_, trainable, _ = partition_trainable(params, cfg)


def per_device_bytes(specs, n_data):
    tot_p = tot_m = 0
    p_flat = jax.tree_util.tree_leaves(params)
    s_flat = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    t_flat = trainable
    assert len(p_flat) == len(s_flat) == len(t_flat)
    for leaf, spec, tr in zip(p_flat, s_flat, t_flat):
        div = n_data if any(
            e == DATA_AXIS or (isinstance(e, tuple) and DATA_AXIS in e)
            for e in spec if e is not None) else 1
        nbytes = leaf.size * leaf.dtype.itemsize / div
        tot_p += nbytes
        if tr is not None:
            tot_m += 2 * nbytes  # mu + nu, same dtype/sharding as the leaf
    return tot_p, tot_m


GB = 1 << 30
print(f"{'n_data':>6} {'params/dev':>12} {'moments/dev':>12} {'total':>10} "
      f"{'vs DP':>7}")
base_total = None
for n_data in (1, 4, 8, 16, 32):
    specs = param_pspecs(params, fsdp_size=n_data if n_data > 1 else 0)
    p, m = per_device_bytes(specs, n_data)
    total = p + m
    if base_total is None:
        base_total = total
    print(f"{n_data:>6} {p / GB:>10.3f}GB {m / GB:>10.3f}GB "
          f"{total / GB:>8.3f}GB {base_total / total:>6.2f}x")
