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


def test_enable_compilation_cache_tmpdir(tmp_path):
    enable_compilation_cache(str(tmp_path / "cache"))
    assert (tmp_path / "cache").is_dir()
