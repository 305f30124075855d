"""Parameter / batch partitioning over the (data, model) mesh.

DP (the reference's only strategy — DDP over NCCL, train_ddp.py:145,189)
maps to: batch sharded P('data'), params replicated; the gradient all-reduce
is inserted by XLA/GSPMD because the loss reduces over a sharded batch into
replicated params.

TP (not in the reference; a TPU-native extra) shards every transformer
block's projection weights over the `model` axis: qkv/fc1 column-wise, the
following out/fc2 row-wise, so each attention+MLP pair needs exactly one
all-reduce of activations — the Megatron layout expressed through GSPMD
sharding constraints rather than explicit collectives. Block params are
stacked [L, ...], so specs lead with None for the layer axis.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS


def _path_names(path):
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return out


# (parent module, leaf) -> which axis of the (in, out) matmul is sharded.
_COL = {("q", "w"), ("k", "w"), ("v", "w"), ("fc1", "w"),
        ("q", "b"), ("k", "b"), ("v", "b"), ("fc1", "b")}
_ROW = {("out", "w"), ("fc2", "w")}


def _tp_spec(path, leaf) -> P:
    names = _path_names(path)
    if "blocks" not in names:
        return P()
    if len(names) < 2:
        return P()
    pair = (names[-2], names[-1])
    stacked = 1  # leading [L] layer-stack axis
    if pair in _COL:
        # column-parallel: shard the output dim (last axis)
        spec = [None] * (leaf.ndim - 1) + [MODEL_AXIS]
        return P(*spec)
    if pair in _ROW:
        # row-parallel: shard the input dim (second-to-last axis)
        spec = [None] * leaf.ndim
        spec[-2] = MODEL_AXIS
        return P(*spec)
    return P()


def param_pspecs(params, tp: bool = False):
    if not tp:
        return jax.tree_util.tree_map(lambda _: P(), params)
    return jax.tree_util.tree_map_with_path(_tp_spec, params)


def partition_params(params, mesh: Mesh, tp: bool = False):
    """device_put the param tree with its partition specs; jit consumes the
    shardings from the arrays themselves."""
    specs = param_pspecs(params, tp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_batch(batch, mesh: Mesh):
    """Shard every leaf's leading (batch) dim over the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
