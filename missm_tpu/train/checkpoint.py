"""Checkpointing with the reference's two-artifact contract:

1. best full checkpoint — {epoch, model params, opt state, val_metrics,
   args} saved whenever val accuracy improves (train_ddp.py:300-306);
2. final model params — the best params re-saved standalone at the end
   (train_ddp.py:320-323), what test.py loads (:92).

Orbax handles the array trees (async-capable, TPU-friendly); small metadata
rides alongside as JSON. Mid-run resume (which the reference lacks) comes
for free: restore the best checkpoint and continue.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def _host_value(x):
    """Materialize a leaf on every host. Leaves sharded ACROSS processes
    (FSDP params / Adam moments under jax.process_count() > 1) are not
    np.asarray-able — all-gather them first so the saved artifact is the
    full logical array, loadable by a single-process test.py run (the
    reference's final_model contract, train_ddp.py:320-323)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _write(path: str, host_tree: Any, metadata: Optional[dict]):
    """The slow part: orbax serialization + disk. `host_tree` must already
    be host numpy arrays (see AsyncSaver for why)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, host_tree, force=True)
    # the orbax save is collective (every process calls it; the primary
    # host writes), but this JSON write is a plain file op — only the
    # primary writes it, or concurrent hosts could interleave/truncate
    # it on a shared filesystem (reference: rank-0-only torch.save,
    # train_ddp.py:300-306).
    if metadata is not None and jax.process_index() == 0:
        with open(os.path.join(path, "missm_meta.json"), "w") as f:
            json.dump(metadata, f, default=str)


def save_checkpoint(path: str, tree: Any, metadata: Optional[dict] = None):
    """Save a pytree + metadata dict at `path` (a directory)."""
    _write(path, jax.tree_util.tree_map(_host_value, tree), metadata)


class AsyncSaver:
    """Checkpoint saves off the training path.

    The pytree is materialized on host SYNCHRONOUSLY in save() — two
    reasons it cannot move to the thread: the donated train step
    invalidates device buffers the moment the next step runs, and
    _host_value's cross-process all-gather (FSDP leaves) is a collective
    that must not interleave with train-step collectives. The write —
    the slow orbax serialization + disk part, plus orbax's out-of-band
    multihost sync barrier — runs in a background thread. At most one
    write is in flight: a newer save joins the previous first
    (same-path writes must not interleave), and errors surface at the
    next save()/wait().
    """

    def __init__(self):
        self._thread = None
        self._err: Optional[BaseException] = None

    def save(self, path: str, tree: Any, metadata: Optional[dict] = None):
        # np.array (not asarray): _host_value can ALIAS the source buffer
        # (numpy leaves; XLA:CPU buffers) and a donated train step reuses
        # it while the write is still in flight — snapshot by copy
        host_tree = jax.tree_util.tree_map(
            lambda x: np.array(_host_value(x)), tree)
        self.wait()

        def work():
            try:
                _write(path, host_tree, metadata)
            except BaseException as e:  # noqa: BLE001 - surface at wait()
                self._err = e

        import threading
        self._thread = threading.Thread(target=work, daemon=True,
                                        name="missm-ckpt-save")
        self._thread.start()

    def wait(self):
        """Block until the in-flight write (if any) lands; re-raise its
        error. MUST be called before restoring a path this saver wrote."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def restore_checkpoint(path: str, like: Any = None):
    """Restore (tree, metadata). `like` provides the target structure."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(path)
    if like is not None:
        # conform restored leaves onto the template's structure/dtypes
        tree = jax.tree_util.tree_map(
            lambda t, x: jax.numpy.asarray(x, t.dtype), like, tree)
    meta_path = os.path.join(path, "missm_meta.json")
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta
