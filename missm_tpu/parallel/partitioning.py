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

FSDP (also a TPU-native extra; ZeRO-3 equivalent) shards every large param
leaf — and, because optimizer moments are zeros_like the sharded leaves,
the Adam state with it — over the `data` axis. XLA all-gathers a weight
just before its matmul and reduce-scatters its gradient, so per-device
memory for params + moments drops ~n_data× while the math stays exactly
DP. Leaves smaller than `fsdp_min_size` elements stay replicated (the
gather latency would dominate); for the [L, ...]-stacked block leaves the
leading scan axis is never sharded (lax.scan slices it every layer).
Composes with TP: the TP-sharded axis is excluded, the largest remaining
divisible axis is used.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS


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


def _pipe_spec(path, leaf, base: P) -> P:
    """Shard the [L, ...] stacked block leaves' layer axis over the pipe
    mesh axis (each pipeline stage holds its own L/S layers + their Adam
    state). Non-block leaves stay replicated over pipe — the pipelined
    region only consumes block params (parallel/pipeline.py)."""
    if "blocks" not in _path_names(path) or leaf.ndim == 0:
        return base
    spec = list(base) + [None] * (leaf.ndim - len(base))
    spec[0] = PIPE_AXIS
    return P(*spec)


FSDP_MIN_SIZE = 65536  # leaves below this (elements) stay replicated


def _fsdp_spec(path, leaf, base: P, n_data: int, min_size: int) -> P:
    """Extend `base` (the TP spec, possibly empty) with a DATA_AXIS shard on
    the largest still-unsharded axis divisible by n_data."""
    if leaf.ndim == 0 or leaf.size < min_size:
        return base
    spec = list(base) + [None] * (leaf.ndim - len(base))
    start = 1 if "blocks" in _path_names(path) else 0  # never the scan axis
    best = None
    for ax in range(start, leaf.ndim):
        if spec[ax] is not None:
            continue
        if leaf.shape[ax] % n_data:
            continue
        if best is None or leaf.shape[ax] > leaf.shape[best]:
            best = ax
    if best is None:
        return base
    spec[best] = DATA_AXIS
    return P(*spec)


def param_pspecs(params, tp: bool = False, fsdp_size: int = 0,
                 fsdp_min_size: int = FSDP_MIN_SIZE, pipe: bool = False):
    """Partition specs for the param tree. `tp` adds the Megatron col/row
    specs over MODEL_AXIS; `pipe` shards the block stacks' layer axis over
    PIPE_AXIS; `fsdp_size` > 1 additionally shards large leaves over
    DATA_AXIS (ZeRO-3)."""
    if tp:
        specs = jax.tree_util.tree_map_with_path(_tp_spec, params)
    else:
        specs = jax.tree_util.tree_map(lambda _: P(), params)
    if pipe:
        specs = jax.tree_util.tree_map_with_path(_pipe_spec, params, specs)
    if fsdp_size and fsdp_size > 1:
        specs = jax.tree_util.tree_map_with_path(
            lambda p, leaf, s: _fsdp_spec(p, leaf, s, fsdp_size,
                                          fsdp_min_size),
            params, specs)
    return specs


def partition_params(params, mesh: Mesh, tp: bool = False,
                     fsdp: bool = False,
                     fsdp_min_size: int = FSDP_MIN_SIZE,
                     pipe: bool = False):
    """device_put the param tree with its partition specs; jit consumes the
    shardings from the arrays themselves."""
    specs = param_pspecs(params, tp,
                         fsdp_size=mesh.shape[DATA_AXIS] if fsdp else 0,
                         fsdp_min_size=fsdp_min_size, pipe=pipe)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_batch(batch, mesh: Mesh):
    """Shard every leaf's leading (batch) dim over the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
