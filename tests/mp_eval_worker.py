"""Worker for test_two_process_eval_gather: one of two jax.distributed CPU
processes. Evaluates its own 6-row shard through evaluate_loader's
multihost gather; process 0 also computes the single-process ground truth
(exact-shape batches over the union, paired host-by-host) and saves both.

Usage: mp_eval_worker.py <pid> <tmpdir> <port>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

PID = int(sys.argv[1])
TMP = sys.argv[2]
PORT = sys.argv[3]

jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=2, process_id=PID)

import numpy as np
import jax.numpy as jnp

from tests.test_eval_parity import ListLoader, _tiny_setup
from missm_tpu.eval.sweep import evaluate_loader
from missm_tpu.train.step import make_eval_step

N, PER_HOST, BS = 12, 6, 4
cfg, params, data, labels, missing = _tiny_setup(n=N, seed=3)
lo, hi = PID * PER_HOST, (PID + 1) * PER_HOST
loader = ListLoader({k: v[lo:hi] for k, v in data.items()},
                    labels[lo:hi], missing[lo:hi], batch_size=BS)
ev = make_eval_step(cfg)
assert jax.process_count() == 2
losses, out_labels, preds, probs = evaluate_loader(params, ev, loader)

if PID == 0:
    np.savez(os.path.join(TMP, "mp_eval_out.npz"), labels=out_labels,
             preds=preds, probs=probs, loss=np.asarray(losses))
    # ground truth: exact-shape batches over the union, no padding, no
    # collectives — batch i pairs host0's batch i with host1's batch i
    ref_labels, ref_preds, ref_probs, ref_losses = [], [], [], []
    n_batches = -(-PER_HOST // BS)
    jdata = {k: jnp.asarray(v) for k, v in data.items()}
    for i in range(n_batches):
        rows = []
        for p in range(2):
            s = p * PER_HOST + i * BS
            rows.extend(range(s, min(s + BS, (p + 1) * PER_HOST)))
        rows = np.asarray(rows)
        out = ev(params, {k: v[rows] for k, v in jdata.items()},
                 jnp.asarray(labels[rows]), jnp.asarray(missing[rows]))
        ref_losses.append(float(out["loss"]))
        ref_preds.append(np.asarray(out["preds"]))
        ref_probs.append(np.asarray(out["probs"]))
        ref_labels.append(labels[rows])
    np.savez(os.path.join(TMP, "mp_eval_ref.npz"),
             labels=np.concatenate(ref_labels),
             preds=np.concatenate(ref_preds),
             probs=np.concatenate(ref_probs),
             loss=np.asarray(ref_losses))
print(f"worker {PID} ok", flush=True)
