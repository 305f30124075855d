"""FSDP over an ODD device count (3): no tiny-ViT dim is guaranteed
divisible, so `_fsdp_spec`'s divisibility guard must degrade per-leaf —
leaves with a %3-divisible axis shard (vocab 99, projection 24), the
rest replicate — and the mixed layout must still train math-identical
to pure DP. The even-count paths (2/4/8) are covered by the dryrun and
the FSDP composition tests; this pins the fallback the odd count
forces."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.core.mesh import make_mesh
from missm_tpu.parallel import partition_params, shard_batch
from missm_tpu.parallel.partitioning import param_pspecs
from missm_tpu.train.step import init_train_state, make_train_step
from tests.test_eval_parity import _tiny_setup


def test_fsdp_three_devices_mixed_sharding_matches_dp():
    cfg, base, data, labels, missing = _tiny_setup(n=24, seed=4)
    data = {k: jnp.asarray(v) for k, v in data.items()}
    labels, missing = jnp.asarray(labels), jnp.asarray(missing)

    # spec-level: the divisibility guard shards what it can, replicates
    # the rest (min_size dropped so small leaves participate)
    specs = param_pspecs(base, fsdp_size=3, fsdp_min_size=8)
    tok = specs["encoder"]["language"]["text"]["token_embedding"]
    assert "data" in str(tok), tok  # vocab 99 = 3 * 33
    fc1 = specs["encoder"]["image"]["vision"]["blocks"]["mlp"]["fc1"]["w"]
    assert "data" not in str(fc1), fc1  # [L, 32, 64]: nothing % 3 == 0

    results = []
    for n_data, fsdp in ((8, False), (3, True)):
        mesh = make_mesh(n_data=n_data, n_model=1,
                         devices=jax.devices()[:n_data])
        params = partition_params(
            jax.tree_util.tree_map(lambda x: x + 0.0, base), mesh,
            fsdp=fsdp, fsdp_min_size=8)
        if fsdp:
            w = params["encoder"]["language"]["text"]["token_embedding"]
            shard = w.addressable_shards[0].data
            assert shard.shape[0] == w.shape[0] // 3, shard.shape
        state, tx = init_train_state(params, cfg)
        step = make_train_step(cfg, tx)
        for i in range(2):
            state, m = step(state, shard_batch(data, mesh), labels,
                            missing, 1e-2, jax.random.PRNGKey(i))
        results.append((float(m["loss"]),
                        np.asarray(state.params["fusion"]["proj"]["image"]
                                   ["w"])))

    (loss_dp, w_dp), (loss_f, w_f) = results
    assert loss_dp == pytest.approx(loss_f, rel=1e-5)
    np.testing.assert_allclose(w_dp, w_f, atol=1e-5, rtol=1e-4)
