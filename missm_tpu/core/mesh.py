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
        # topology-aware placement: on real TPU slices the enumeration
        # order of jax.devices() does not track ICI adjacency, so a naive
        # reshape can put a model/pipe pair on non-neighbor chips and
        # turn every per-block TP all-reduce / pipeline ppermute into a
        # multi-hop transfer. mesh_utils picks a physical assignment
        # whose MINOR axes are ICI neighbors (the data axis, carrying one
        # gradient all-reduce per step, tolerates the longer paths).
        # Non-TPU platforms fall through to the same row-major reshape.
        from jax.experimental import mesh_utils
        try:
            grid = mesh_utils.create_device_mesh(shape, devices=devices)
            return Mesh(grid, axes)
        except Exception as e:  # noqa: BLE001 — fallback is always correct
            # odd shapes/topologies (or devices without coords, e.g. the
            # tunneled single-chip backend): enumeration order is a
            # correct fallback, but on a real multi-chip slice it can put
            # model/pipe partners on non-neighbor chips — say so instead
            # of silently eating a perf cliff
            if len(devices) > 1 and (n_model > 1 or n_pipe > 1):
                import warnings
                warnings.warn(
                    f"topology-aware mesh placement failed ({e!r}); "
                    f"falling back to device enumeration order — "
                    f"model/pipe collectives may cross non-neighbor "
                    f"chips", stacklevel=2)
    if n_data * n_model * n_pipe != len(devices):
        devices = devices[: n_data * n_model * n_pipe]
    return Mesh(np.asarray(devices).reshape(shape), axes)


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
