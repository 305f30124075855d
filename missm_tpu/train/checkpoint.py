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


_SWAP_COUNTER = [0]


class _SerialWriter:
    """ALL checkpoint writes in a process run on ONE daemon thread, in
    submission order.

    Why order (not just mutual exclusion) matters: under
    jax.process_count() > 1 each `_write` is a COLLECTIVE (orbax's save
    barriers + the swap barrier below) — every process must enter the
    same writes in the same order or barriers pair across different
    writes and the job hangs. The train loop submits writes in program
    order, which GSPMD replication makes identical on every host; a
    per-saver thread (the previous design) let the OS scheduler pick the
    cross-saver order per host. A single submission-ordered queue makes
    the execution order the program order. It also makes _SWAP_COUNTER
    single-threaded."""

    def __init__(self):
        import threading
        self._lock = threading.Lock()
        self._q = None
        self._thread = None

    def submit(self, fn):
        """Enqueue fn; returns a job with .done (Event) and .err."""
        import queue
        import threading

        class _Job:
            __slots__ = ("fn", "err", "done")

            def __init__(self, fn):
                self.fn = fn
                self.err = None
                self.done = threading.Event()

        with self._lock:
            if self._thread is None or not self._thread.is_alive():
                self._q = queue.Queue()

                def run(q=self._q):
                    while True:
                        job = q.get()
                        try:
                            job.fn()
                        except BaseException as e:  # noqa: BLE001
                            job.err = e
                        finally:
                            job.done.set()

                # daemon: see AsyncSaver docstring (crash-safety comes
                # from _write's atomic swap, not from draining at exit)
                self._thread = threading.Thread(
                    target=run, daemon=True, name="missm-ckpt-writer")
                self._thread.start()
            job = _Job(fn)
            self._q.put(job)
        return job


_WRITER = _SerialWriter()


def _meta_json(metadata: Optional[dict]) -> Optional[str]:
    """Serialize metadata SYNCHRONOUSLY at submission time: callers pass
    live structures (the train loop's growing `history` list) and the
    write runs later on the writer thread — serializing then would
    capture mutations newer than the checkpoint's arrays."""
    return None if metadata is None else json.dumps(metadata, default=str)


def _write(path: str, host_tree: Any, metadata: Optional[str]):
    """The slow part: orbax serialization + disk. `host_tree` must already
    be host numpy arrays (see AsyncSaver for why); `metadata` is a
    pre-serialized JSON string (see _meta_json). Runs on the _WRITER
    thread — never call directly from two threads (collective-order
    invariant, _SerialWriter docstring).

    Crash-safe: serializes into `path + ".tmp"` and atomically swaps it
    in only once complete, so a process dying mid-write (OOM, preemption,
    an exception unwinding past an in-flight AsyncSaver write) can never
    destroy the previous checkpoint at `path` — an orbax force=True save
    directly onto `path` deletes the old artifact before the new one is
    durable."""
    ocp = _ocp()
    path = os.path.abspath(path)
    tmp, old = path + ".tmp", path + ".old"
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(tmp, host_tree, force=True)
    # the orbax save is collective (every process calls it; the primary
    # host writes), but these file ops are plain — only the primary
    # runs them, or concurrent hosts could interleave/truncate on a
    # shared filesystem (reference: rank-0-only torch.save,
    # train_ddp.py:300-306).
    if jax.process_index() == 0:
        if metadata is not None:
            with open(os.path.join(tmp, "missm_meta.json"), "w") as f:
                f.write(metadata)
        import shutil
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(path):
            os.rename(path, old)  # keep the previous best until the
        os.rename(tmp, path)      # new one is in place
        if os.path.isdir(old):
            shutil.rmtree(old)
    if jax.process_count() > 1:
        # non-primary hosts must not restore `path` before the swap
        # lands; out-of-band KV barrier (same channel orbax's own save
        # barrier uses — NOT an XLA collective)
        from jax.experimental import multihost_utils
        _SWAP_COUNTER[0] += 1
        multihost_utils.sync_global_devices(
            f"missm_ckpt_swap_{_SWAP_COUNTER[0]}")


def save_checkpoint(path: str, tree: Any, metadata: Optional[dict] = None):
    """Save a pytree + metadata dict at `path` (a directory). Blocks
    until the write lands; routed through the process-wide serial writer
    so synchronous saves cannot interleave with in-flight AsyncSaver
    writes (collective-order invariant, _SerialWriter docstring)."""
    host_tree = jax.tree_util.tree_map(_host_value, tree)
    job = _WRITER.submit(lambda: _write(path, host_tree, _meta_json(metadata)))
    job.done.wait()
    if job.err is not None:
        raise job.err


class AsyncSaver:
    """Checkpoint saves off the training path.

    The pytree is materialized on host SYNCHRONOUSLY in save() — two
    reasons it cannot move to the thread: the donated train step
    invalidates device buffers the moment the next step runs, and
    _host_value's cross-process all-gather (FSDP leaves) is a collective
    that must not interleave with train-step collectives. The write —
    the slow orbax serialization + disk part, plus orbax's out-of-band
    multihost sync barrier — runs on the process-wide _WRITER thread,
    which executes ALL checkpoint writes (every saver + synchronous
    save_checkpoint) one at a time in submission order — the invariant
    the multihost swap barrier needs (_SerialWriter docstring). Per
    saver, at most one write is in flight: a newer save joins the
    previous first, and errors surface at the next save()/wait().

    Crash semantics: _write serializes to a temp dir and atomically
    swaps, so a process dying with a write in flight (the train loop
    raising before it reaches wait(), preemption, OOM) loses at most
    the NEW best — the previous checkpoint at `path` stays intact,
    exactly as if the crash had happened a moment before save(). The
    thread is daemon: a non-daemon thread cannot finish an orbax write
    that STARTS during interpreter shutdown anyway (executor creation
    is refused), and joining a multihost save barrier at exit could
    hang a crashed run.
    """

    def __init__(self):
        self._job = None

    @staticmethod
    def _snapshot(x):
        # _host_value can ALIAS the source buffer (numpy leaves; XLA:CPU
        # buffers) and a donated train step reuses it while the write is
        # still in flight — snapshot those by copy. Non-CPU jax.Arrays
        # already paid a device->host transfer into fresh memory; don't
        # memcpy a multi-GB param tree a second time on the train path.
        h = _host_value(x)
        if isinstance(x, jax.Array) and all(
                d.platform != "cpu" for d in x.devices()):
            return h
        return np.array(h)

    def save(self, path: str, tree: Any, metadata: Optional[dict] = None):
        host_tree = jax.tree_util.tree_map(self._snapshot, tree)
        meta_json = _meta_json(metadata)  # snapshot NOW, not at write time
        self.wait()
        self._job = _WRITER.submit(lambda: _write(path, host_tree, meta_json))

    def wait(self):
        """Block until the in-flight write (if any) lands; re-raise its
        error. MUST be called before restoring a path this saver wrote."""
        if self._job is not None:
            job, self._job = self._job, None
            job.done.wait()
            if job.err is not None:
                raise job.err


def _resolve_ckpt_dir(path: str) -> str:
    path = os.path.abspath(path)
    if not os.path.isdir(path) and os.path.isdir(path + ".old"):
        # a crash between _write's two renames leaves only the
        # demoted-but-complete previous checkpoint — recover from it
        return path + ".old"
    return path


def read_metadata(path: str) -> Optional[dict]:
    """The metadata dict saved alongside a checkpoint, without paying
    for the array restore."""
    meta_path = os.path.join(_resolve_ckpt_dir(path), "missm_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return None


def restore_checkpoint(path: str, like: Any = None,
                       structure: Any = None):
    """Restore (tree, metadata). `like` conforms leaf dtypes onto a
    template; `structure` makes orbax rebuild the EXACT pytree structure
    (custom nodes like optax's ScaleByAdamState namedtuples, which a
    bare restore flattens into plain dicts/lists)."""
    ocp = _ocp()
    path = _resolve_ckpt_dir(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = (ckptr.restore(path, item=structure) if structure is not None
            else ckptr.restore(path))
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
