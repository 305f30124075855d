"""Child-process body of test_fsdp_composes_with_tp.

The 4x2 FSDP+TP train step mixes weight all-gathers with psums over two
mesh axes — the multi-collective program class that XLA:CPU's thunk
executor can interlock into a rendezvous deadlock (dataflow-ordered
collective execution; CHECK-aborts after ~40 s; TPU executes collectives
in program order per core and is immune — see CLAUDE.md and the
__graft_entry__ dryrun armor). Running the step in a retried child turns
that host-emulation-only fatal abort into a bounded re-run while still
requiring the program to genuinely compile and execute.

Exit codes: 0 = pass, 1 = real assertion failure (not retried).
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from jax.sharding import PartitionSpec as P

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))  # repo root -> missm_tpu
    from test_train_step import tiny_batch, tiny_model_cfg

    from missm_tpu.core.mesh import make_mesh
    from missm_tpu.models.finetune import init_model_params
    from missm_tpu.parallel import partition_params, shard_batch
    from missm_tpu.train.step import init_train_state, make_train_step

    cfg = tiny_model_cfg("sum")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    params = partition_params(params, mesh, tp=True, fsdp=True,
                              fsdp_min_size=128)
    w = params["encoder"]["image"]["vision"]["blocks"]["mlp"]["fc1"]["w"]
    assert w.sharding.spec == P(None, "data", "model"), w.sharding
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx)
    data, labels, missing = tiny_batch()
    data = shard_batch(data, mesh)
    state, m = step(state, data, labels, missing, 1e-3, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    print("FSDP_TP_OK")


if __name__ == "__main__":
    main()
