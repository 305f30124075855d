"""Core utilities: PRNGSeq, mesh helpers, compilation cache."""
import numpy as np
import pytest

import jax

from missm_tpu.core.cache import enable_compilation_cache
from missm_tpu.core.mesh import (data_sharding, local_batch_size, make_mesh,
                                 replicated)
from missm_tpu.core.prng import PRNGSeq


def test_prngseq_unique_keys():
    seq = PRNGSeq(0)
    keys = [np.asarray(seq.next()) for _ in range(4)] + [
        np.asarray(k) for k in seq.split(3)]
    flat = [tuple(k.tolist()) for k in keys]
    assert len(set(flat)) == len(flat)
    # deterministic across instances
    seq2 = PRNGSeq(0)
    np.testing.assert_array_equal(np.asarray(seq2.next()), keys[0])


def test_mesh_helpers():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    assert local_batch_size(16, mesh) == 4
    with pytest.raises(ValueError):
        local_batch_size(10, mesh)
    assert data_sharding(mesh).spec == jax.sharding.PartitionSpec("data")
    assert replicated(mesh).spec == jax.sharding.PartitionSpec()


def test_mesh_truncates_nondivisible_devices():
    mesh = make_mesh(n_data=3, n_model=2)  # 6 of the 8 devices
    assert mesh.shape == {"data": 3, "model": 2}


def test_mesh_topology_path_covers_all_devices():
    """The mesh_utils topology-aware path (taken when no explicit device
    list is passed and the factors cover all devices) must still place
    every device exactly once; on CPU it reduces to enumeration order."""
    mesh = make_mesh(n_data=2, n_model=2, n_pipe=2)
    assert mesh.shape == {"data": 2, "model": 2, "pipe": 2}
    got = {d.id for d in mesh.devices.ravel()}
    assert got == {d.id for d in jax.devices()}


def test_hybrid_shapes():
    """Multi-slice layouts: only the data axis spans DCN; model/pipe must
    fit inside a slice; uneven data splits are rejected."""
    from missm_tpu.core.mesh import hybrid_shapes
    assert hybrid_shapes(8, 1, 1, 2) == ((4, 1), (2, 1))
    assert hybrid_shapes(8, 2, 1, 4) == ((2, 2), (4, 1))
    assert hybrid_shapes(8, 2, 2, 2) == ((4, 2, 2), (2, 1, 1))
    assert hybrid_shapes(6, 1, 1, 4) is None  # 6 % 4 != 0
    assert hybrid_shapes(8, 1, 1, 1) is None  # single slice: not hybrid


def test_topology_grid_routes_multislice_to_hybrid(monkeypatch):
    """Devices reporting distinct slice_index route through
    create_hybrid_device_mesh with the data axis on DCN."""
    import numpy as np

    from jax.experimental import mesh_utils

    from missm_tpu.core.mesh import _topology_grid

    class FakeDev:
        def __init__(self, i, s):
            self.id, self.slice_index = i, s

    devs = [FakeDev(i, i // 4) for i in range(8)]  # 2 slices of 4
    calls = {}

    def fake_hybrid(ici, dcn, devices=None):
        calls["args"] = (tuple(ici), tuple(dcn), len(devices))
        return np.array(devices, dtype=object).reshape(ici[0] * dcn[0],
                                                       ici[1] * dcn[1])

    monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh", fake_hybrid)
    grid = _topology_grid(devs, (8, 1), 8, 1, 1)
    assert calls["args"] == ((4, 1), (2, 1), 8)
    assert grid.shape == (8, 1)

    # data axis that cannot split evenly over the slices: falls back
    # (returns None) with a warning rather than silently interleaving
    # DCN slices along the data axis
    devs9 = [FakeDev(i, i // 5) for i in range(9)]  # slices of 5 and 4
    with pytest.warns(UserWarning, match="topology-aware"):
        assert _topology_grid(devs9, (9, 1), 9, 1, 1) is None


def test_enable_compilation_cache_tmpdir(tmp_path):
    enable_compilation_cache(str(tmp_path / "cache"))
    assert (tmp_path / "cache").is_dir()


def test_lora_linear_grads_match_unfused():
    """The custom-VJP rank-r LoRA gradients must equal autodiff of the
    unfused formulation y = x @ w + (x @ a) @ b * scaling (f32)."""
    import jax.numpy as jnp
    from missm_tpu.ops.basic import linear

    k = jax.random.PRNGKey(7)
    kx, kw, ka, kb, kg = jax.random.split(k, 5)
    B, N, Din, Dout, r = 2, 5, 16, 12, 2
    s = 16 / 2  # lora_alpha / r
    x = jax.random.normal(kx, (B, N, Din))
    w = jax.random.normal(kw, (Din, Dout)) * 0.1
    a = jax.random.normal(ka, (Din, r)) * 0.1
    b = jax.random.normal(kb, (r, Dout)) * 0.1
    bias = jax.random.normal(kg, (Dout,)) * 0.1
    cot = jax.random.normal(kg, (B, N, Dout))

    def loss_fused(x, w, a, b):
        p = {"w": w, "b": bias, "lora_a": a, "lora_b": b}
        return (linear(p, x, lora_scaling=s) * cot).sum()

    def loss_unfused(x, w, a, b):
        y = x @ w + (x @ a) @ b * s + bias
        return (y * cot).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, a, b)
    g2 = jax.grad(loss_unfused, argnums=(0, 1, 2, 3))(x, w, a, b)
    for got, want in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
    # forward parity too
    p = {"w": w, "b": bias, "lora_a": a, "lora_b": b}
    np.testing.assert_allclose(
        np.asarray(linear(p, x, lora_scaling=s)),
        np.asarray(x @ w + (x @ a) @ b * s + bias), rtol=2e-5, atol=2e-5)
