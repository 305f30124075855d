"""Device mesh construction.

The reference's only parallelism is DDP data-parallel over NCCL
(train_ddp.py:145,189). Here the equivalent is a `jax.sharding.Mesh` with a
`data` axis; gradient reduction is XLA's job once the batch is sharded. A
second `model` axis is available for tensor-parallel sharding of the tower
matmuls (attention heads / MLP columns), which the reference does not have.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              n_pipe: int = 1, devices=None) -> Mesh:
    """Build a (data, model[, pipe]) mesh over the available devices.

    With no arguments, uses all devices on the data axis (pure DP) — the
    TPU-native equivalent of the reference's DDP world. A `pipe` axis is
    only materialized when n_pipe > 1 (pipeline parallelism,
    parallel/pipeline.py), so existing 2-axis meshes are unchanged.
    """
    explicit = devices is not None
    devices = list(devices if explicit else jax.devices())
    if len(devices) < n_model * n_pipe:
        raise ValueError(
            f"mesh needs at least n_model*n_pipe = {n_model}*{n_pipe} = "
            f"{n_model * n_pipe} devices, have {len(devices)}")
    if n_data is None:
        n_data = len(devices) // (n_model * n_pipe)
    shape = ((n_data, n_model, n_pipe) if n_pipe > 1
             else (n_data, n_model))
    axes = ((DATA_AXIS, MODEL_AXIS, PIPE_AXIS) if n_pipe > 1
            else (DATA_AXIS, MODEL_AXIS))
    if not explicit and n_data * n_model * n_pipe == len(devices):
        grid = _topology_grid(devices, shape, n_data, n_model, n_pipe)
        if grid is not None:
            return Mesh(grid, axes)
    if n_data * n_model * n_pipe != len(devices):
        devices = devices[: n_data * n_model * n_pipe]
    return Mesh(np.asarray(devices).reshape(shape), axes)


def hybrid_shapes(n_data: int, n_model: int, n_pipe: int, n_slices: int):
    """(per-slice ICI shape, DCN shape) for a multi-slice deployment, or
    None when the layout cannot put model/pipe inside a slice.

    Only the DATA axis spans slices: it carries one gradient all-reduce
    per step and tolerates DCN latency, while the model/pipe axes
    exchange activations every block and must ride ICI. Requires the
    data axis to split evenly across slices and every slice to hold the
    full model*pipe extent."""
    if n_slices <= 1 or n_data % n_slices:
        return None
    if n_pipe > 1:
        return ((n_data // n_slices, n_model, n_pipe), (n_slices, 1, 1))
    return ((n_data // n_slices, n_model), (n_slices, 1))


def _topology_grid(devices, shape, n_data, n_model, n_pipe):
    """Physical device grid for `shape`, or None to use enumeration order.

    Single slice: mesh_utils.create_device_mesh picks an assignment whose
    MINOR axes (model, pipe) are ICI neighbors — the enumeration order of
    jax.devices() does not track ICI adjacency, and a naive reshape can
    turn every per-block TP all-reduce / pipeline ppermute into a
    multi-hop transfer.

    Multiple slices (devices report distinct slice_index — a multi-slice
    DCN deployment): create_hybrid_device_mesh additionally keeps each
    slice's devices contiguous on the minor axes so ONLY the data axis
    crosses the DCN boundary.

    Non-TPU platforms and odd topologies fall back to row-major
    enumeration order (correct, possibly slower) — with a warning when
    the layout has model/pipe partners that could land on non-neighbor
    chips."""
    from jax.experimental import mesh_utils
    slices = {getattr(d, "slice_index", None) for d in devices}
    slices.discard(None)
    try:
        if len(slices) > 1:
            hyb = hybrid_shapes(n_data, n_model, n_pipe, len(slices))
            if hyb is None:
                raise ValueError(
                    f"data axis {n_data} does not split over "
                    f"{len(slices)} slices with model={n_model} "
                    f"pipe={n_pipe} inside each slice")
            ici, dcn = hyb
            return mesh_utils.create_hybrid_device_mesh(
                ici, dcn, devices=devices)
        return mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception as e:  # noqa: BLE001 — fallback is always correct
        # odd shapes/topologies (or devices without coords, e.g. the
        # tunneled single-chip backend): enumeration order is a correct
        # fallback, but on a real multi-chip slice it can put model/pipe
        # partners on non-neighbor chips — say so instead of silently
        # eating a perf cliff
        if len(devices) > 1 and (n_model > 1 or n_pipe > 1
                                 or len(slices) > 1):
            import warnings
            warnings.warn(
                f"topology-aware mesh placement failed ({e!r}); "
                f"falling back to device enumeration order — "
                f"model/pipe collectives may cross non-neighbor chips"
                + (" and the data axis interleaves DCN slices"
                   if len(slices) > 1 else ""), stacklevel=2)
        return None


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {n}")
    return global_batch // n
