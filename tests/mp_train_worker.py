"""Worker for test_two_process_train_parity: one of two jax.distributed CPU
processes. Runs K DP train steps over a 2-device GLOBAL mesh — each process
contributes its half of every batch via make_array_from_process_local_data,
and GSPMD inserts the cross-process gradient all-reduce (the rebuild's
equivalent of the reference's DDP grad hooks, train_ddp.py:145,189).

Process 0 additionally exercises the rank-0-only side effects of the train
loop (checkpoint write + TensorBoard scalars, cli/train.py:79) and saves the
final params for the parent to compare against its single-process ground
truth.

In "fsdp" mode the params (and, via zeros_like, the Adam moments) are
additionally sharded over the CROSS-PROCESS data axis — ZeRO-3 where each
host owns half of every large leaf. The all-gather-before-use /
reduce-scatter-of-grads then rides the process interconnect, and the
collective checkpoint save must reassemble the full logical arrays
(train/checkpoint.py::_host_value).

Usage: mp_train_worker.py <pid> <tmpdir> <port> [dp|fsdp]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

PID = int(sys.argv[1])
TMP = sys.argv[2]
PORT = sys.argv[3]
MODE = sys.argv[4] if len(sys.argv) > 4 else "dp"

jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=2, process_id=PID)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_eval_parity import _tiny_setup
from missm_tpu.core.mesh import make_mesh
from missm_tpu.train.step import init_train_state, make_train_step

assert jax.process_count() == 2 and len(jax.devices()) == 2

K, GLOBAL_B, HALF = 4, 8, 4
cfg, params, _, _, _ = _tiny_setup(n=1, seed=5)
mesh = make_mesh()
assert mesh.shape["data"] == 2
repl = NamedSharding(mesh, P())
data_sh = NamedSharding(mesh, P("data"))

if MODE == "fsdp":
    from missm_tpu.parallel.partitioning import param_pspecs

    specs = param_pspecs(params, fsdp_size=2, fsdp_min_size=128)

    def gput(x, s):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh, s), lambda idx: arr[idx])

    params = jax.tree_util.tree_map(gput, params, specs)
    # each host must own HALF of the large leaves, not a copy
    w = params["encoder"]["image"]["vision"]["blocks"]["mlp"]["fc1"]["w"]
    shard = w.addressable_shards[0].data
    assert shard.size == w.size // 2, (shard.shape, w.shape)
    state, tx = init_train_state(params, cfg)
    mu = [m for m in jax.tree_util.tree_leaves(state.opt_state)
          if hasattr(m, "shape") and m.shape == w.shape]
    assert mu and all(x.addressable_shards[0].data.size == x.size // 2
                      for x in mu), "Adam moments not FSDP-sharded"
else:
    state, tx = init_train_state(params, cfg)
    state = jax.device_put(state, repl)
step = make_train_step(cfg, tx)


def put(x):
    """Local shard -> global [GLOBAL_B, ...] array over the 2-process mesh."""
    return jax.make_array_from_process_local_data(
        data_sh, np.ascontiguousarray(x), (GLOBAL_B,) + x.shape[1:])


rng = np.random.default_rng(11)
losses = []
for i in range(K):
    # the SAME global batch stream the parent generates; this process
    # contributes rows [PID*HALF, (PID+1)*HALF) — per-process loader
    # sharding as in cli/train.py:51-57
    ids = np.ones((GLOBAL_B, 16), np.int32)
    ids[:, 1:6] = rng.integers(2, 90, size=(GLOBAL_B, 5))
    img = rng.standard_normal((GLOBAL_B, 3, 32, 32)).astype(np.float32)
    labels = rng.integers(0, 3, GLOBAL_B).astype(np.int32)
    missing = rng.choice([0, 1, 4], GLOBAL_B).astype(np.int32)
    lo, hi = PID * HALF, (PID + 1) * HALF
    data = {"language": put(ids[lo:hi]), "image": put(img[lo:hi])}
    state, m = step(state, data, put(labels[lo:hi]), put(missing[lo:hi]),
                    1e-3, jax.random.PRNGKey(100 + i))
    losses.append(float(m["loss"]))

from missm_tpu.train.checkpoint import _host_value

final = jax.tree_util.tree_map(_host_value, state.params)

# Checkpoint save is COLLECTIVE (as in train_loop): every process calls it;
# Orbax writes from the primary host only — the TPU-native equivalent of
# the reference's rank-0 `torch.save` (train_ddp.py:300-306).
from missm_tpu.train.checkpoint import save_checkpoint
save_checkpoint(os.path.join(TMP, "ckpt"), {"params": state.params},
                metadata={"k_steps": K})

tb_dir = os.path.join(TMP, f"tb_rank{PID}")
if jax.process_index() == 0:
    # TB scalars stay rank-0-only (cli/train.py:79-84)
    from torch.utils.tensorboard import SummaryWriter
    w = SummaryWriter(log_dir=tb_dir)
    for i, l in enumerate(losses):
        w.add_scalar("Loss/train", l, i)
    w.close()
    leaves = jax.tree_util.tree_leaves(final)  # deterministic pytree order
    np.savez(os.path.join(TMP, "mp_train_out.npz"),
             losses=np.asarray(losses),
             **{f"leaf_{i}": v for i, v in enumerate(leaves)})
print(f"worker {PID} ok", flush=True)
