"""Multi-slice hybrid mesh placement (core.mesh.make_mesh).

CPU devices carry no slice_index, so the create_hybrid_device_mesh
routing never runs in the normal suite — these tests fake a 2-slice
16-device topology with mock device objects and pin the contract:
ONLY the data axis crosses the DCN (slice) boundary; model/pipe
partners stay inside one slice; impossible layouts fall back to
enumeration order with a loud warning (SURVEY §5 comm-backend row:
DCN only if multi-slice)."""
import warnings

import numpy as np
import pytest

from missm_tpu.core import mesh as mesh_mod
from missm_tpu.core.mesh import hybrid_shapes, make_mesh


class FakeDevice:
    """Quacks enough like a jax device for mesh_utils + Mesh: non-TPU
    platform (so per-slice meshes are plain reshapes) + slice_index."""

    def __init__(self, i, slice_index):
        self.id = i
        self.process_index = slice_index
        self.platform = "cpu"
        self.device_kind = "fake"
        self.slice_index = slice_index

    def __repr__(self):
        return f"FakeDevice(id={self.id}, slice={self.slice_index})"


def _two_slice_devices(n=16):
    return [FakeDevice(i, slice_index=i // (n // 2)) for i in range(n)]


def _grid(monkeypatch, n_model, n_pipe, devices):
    """Run make_mesh's topology routing and return the raw device grid
    (Mesh itself rejects non-Device objects, so capture the grid at the
    Mesh constructor boundary)."""
    captured = {}

    class FakeMesh:
        def __init__(self, grid, axes):
            captured["grid"] = np.asarray(grid)
            captured["axes"] = axes

    monkeypatch.setattr(mesh_mod.jax, "devices", lambda: devices)
    monkeypatch.setattr(mesh_mod, "Mesh", FakeMesh)
    make_mesh(n_model=n_model, n_pipe=n_pipe)
    return captured["grid"], captured["axes"]


def test_hybrid_shapes():
    assert hybrid_shapes(4, 2, 2, 2) == ((2, 2, 2), (2, 1, 1))
    assert hybrid_shapes(8, 2, 1, 2) == ((4, 2), (2, 1))
    assert hybrid_shapes(3, 2, 1, 2) is None      # data not divisible
    assert hybrid_shapes(4, 2, 2, 1) is None      # single slice: not hybrid


def test_two_slice_data_on_dcn_model_pipe_inside_slice(monkeypatch):
    grid, axes = _grid(monkeypatch, n_model=2, n_pipe=2,
                       devices=_two_slice_devices(16))
    assert axes == ("data", "model", "pipe")
    assert grid.shape == (4, 2, 2)
    # model/pipe partners never cross the slice boundary: for each data
    # index, the 2x2 (model, pipe) block lives in ONE slice
    for d in range(4):
        block_slices = {dev.slice_index for dev in grid[d].ravel()}
        assert len(block_slices) == 1, (d, grid[d])
    # the data axis is what crosses DCN: both slices appear along it,
    # each slice contiguous (data split 2+2 over the 2 slices)
    data_slices = [grid[d, 0, 0].slice_index for d in range(4)]
    assert data_slices == [0, 0, 1, 1]
    # every device used exactly once
    assert sorted(dev.id for dev in grid.ravel()) == list(range(16))


def test_two_slice_pure_dp(monkeypatch):
    grid, axes = _grid(monkeypatch, n_model=1, n_pipe=1,
                       devices=_two_slice_devices(16))
    assert axes == ("data", "model")
    assert grid.shape == (16, 1)
    data_slices = [grid[d, 0].slice_index for d in range(16)]
    assert data_slices == [0] * 8 + [1] * 8


def test_impossible_layout_falls_back_with_warning(monkeypatch):
    # 2 slices x 6 devices, n_model=4: data axis = 3, which cannot split
    # over 2 slices -> hybrid_shapes None -> loud fallback to enumeration
    devices = [FakeDevice(i, slice_index=i // 6) for i in range(12)]
    with pytest.warns(UserWarning,
                      match="topology-aware mesh placement failed"):
        grid, axes = _grid(monkeypatch, n_model=4, n_pipe=1,
                           devices=devices)
    assert grid.shape == (3, 4)
    # enumeration order: correct, just not placement-optimized
    assert [dev.id for dev in grid.ravel()] == list(range(12))


def test_single_slice_no_warning(monkeypatch):
    # all devices same slice_index -> single-slice path, no hybrid, and
    # the cpu-platform create_device_mesh reshape must not warn
    devices = [FakeDevice(i, slice_index=0) for i in range(8)]
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        grid, axes = _grid(monkeypatch, n_model=2, n_pipe=1,
                           devices=devices)
    assert grid.shape == (4, 2)
