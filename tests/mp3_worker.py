"""Worker for test_three_process_eval_and_train: one of THREE
jax.distributed CPU processes. The odd process count is the point
(VERDICT r4 #8): with N=13 test rows over 3 shards the DistributedSampler
wrap paths activate asymmetrically — shard 0 holds 5 real rows, shards
1/2 hold 4 real + 1 wrap duplicate, and the final batch has ZERO real
rows on two of the three hosts — exercising evaluate_loader's
wrap-duplicate exclusion and uneven-count gather where a 2-process even
split cannot.

Also runs K=2 DP train steps over the 3-device global mesh (batch 9)
and saves the per-step losses for parity against the parent's
single-process ground truth.

Usage: mp3_worker.py <pid> <tmpdir> <port>
"""
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

PID = int(sys.argv[1])
TMP = sys.argv[2]
PORT = sys.argv[3]

jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=3, process_id=PID)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_eval_parity import _tiny_setup
from missm_tpu.core.mesh import make_mesh
from missm_tpu.data.loaders import BatchLoader
from missm_tpu.eval.sweep import evaluate_loader
from missm_tpu.train.step import (init_train_state, make_eval_step,
                                  make_train_step)

assert jax.process_count() == 3 and len(jax.devices()) == 3

N, BS = 13, 4
cfg, params, data, labels, missing = _tiny_setup(n=N, seed=3)


class ArrayDS:
    """MMDataset-protocol shim over prebuilt arrays: raw 'media' is the
    already-decoded row, 'tokenization' is np.stack."""

    def __init__(self, data, labels, missing):
        self.data, self.labels, self.missing = data, labels, missing
        self.spec = types.SimpleNamespace(modalities=tuple(data))

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i):
        return ({m: self.data[m][i] for m in self.data},
                int(self.labels[i]), int(self.missing[i]))


loader = BatchLoader(ArrayDS(data, labels, missing), BS,
                     tokenizer=lambda rows: np.stack(rows),
                     media_loaders={"image": lambda x: x},
                     shuffle=False, num_shards=3, shard_index=PID)
ev = make_eval_step(cfg)
losses, out_labels, preds, probs = evaluate_loader(params, ev, loader)
assert loader.shard_real_count == (5 if PID == 0 else 4), (
    PID, loader.shard_real_count)

# --- 3-device DP train steps (odd mesh size) ---
mesh = make_mesh()
assert mesh.shape["data"] == 3
data_sh = NamedSharding(mesh, P("data"))
state, tx = init_train_state(params, cfg)
state = jax.device_put(state, NamedSharding(mesh, P()))
step = make_train_step(cfg, tx)

K, GLOBAL_B, PER = 2, 9, 3


def put(x):
    return jax.make_array_from_process_local_data(
        data_sh, np.ascontiguousarray(x), (GLOBAL_B,) + x.shape[1:])


rng = np.random.default_rng(17)
train_losses = []
for i in range(K):
    ids = np.ones((GLOBAL_B, 16), np.int32)
    ids[:, 1:6] = rng.integers(2, 90, size=(GLOBAL_B, 5))
    img = rng.standard_normal((GLOBAL_B, 3, 32, 32)).astype(np.float32)
    lb = rng.integers(0, 3, GLOBAL_B).astype(np.int32)
    mi = rng.choice([0, 1, 4], GLOBAL_B).astype(np.int32)
    lo, hi = PID * PER, (PID + 1) * PER
    state, m = step(state, {"language": put(ids[lo:hi]),
                            "image": put(img[lo:hi])},
                    put(lb[lo:hi]), put(mi[lo:hi]),
                    1e-3, jax.random.PRNGKey(300 + i))
    train_losses.append(float(m["loss"]))

if PID == 0:
    np.savez(os.path.join(TMP, "mp3_out.npz"), labels=out_labels,
             preds=preds, probs=probs, loss=np.asarray(losses),
             train_losses=np.asarray(train_losses))
print(f"worker {PID} ok", flush=True)
