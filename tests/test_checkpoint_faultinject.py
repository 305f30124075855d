"""Fault injection for the crash-safe checkpoint swap (VERDICT r4 #8).

A child process writes checkpoints back-to-back (tree content derived
from the metadata epoch) and is SIGKILLed at randomized points —
including, over enough trials, mid-orbax-serialize, between _write's
renames, and during the old-dir rmtree. After every kill the invariant
of train/checkpoint._write must hold: `restore_checkpoint(path)`
(which resolves `last` or the demoted-but-complete `last.old`) returns
an internally consistent checkpoint — the arrays match the metadata
epoch exactly, never a torn mix. A fresh writer run must then pick up
from the survivor (the preemption-restart idiom)."""
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "ckpt_faultinject_worker.py")

N_KILLS = 6


def _spawn(path, start_epoch=0):
    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    return subprocess.Popen(
        [sys.executable, WORKER, path, REPO, str(start_epoch)],
        stdout=subprocess.PIPE, text=True, env=env, cwd=REPO)


def _wait_first_write(proc, timeout=120.0):
    """Block until the child's first 'WROTE e' line; return e."""
    t0 = time.time()
    line = proc.stdout.readline()
    while not line.startswith("WROTE"):
        assert time.time() - t0 < timeout, "child never wrote"
        assert proc.poll() is None, "child died before first write"
        line = proc.stdout.readline()
    return int(line.split()[1])


def _assert_consistent(path):
    """The surviving checkpoint must restore and be internally
    consistent (epoch metadata == array fill values — a torn write
    would mix epochs or fail to restore)."""
    from missm_tpu.train.checkpoint import read_metadata, restore_checkpoint

    tree, meta = restore_checkpoint(path)
    assert meta is not None and "epoch" in meta, meta
    e = meta["epoch"]
    np.testing.assert_array_equal(np.asarray(tree["epoch_arr"]),
                                  np.full((64, 64), float(e), np.float32))
    np.testing.assert_array_equal(np.asarray(tree["nested"]["w"]),
                                  np.full((8,), float(e) * 2.0, np.float32))
    assert read_metadata(path)["epoch"] == e
    return e


@pytest.mark.slow
def test_sigkill_fuzz_preserves_checkpoint_invariant(tmp_path):
    rng = np.random.default_rng(2025)
    path = str(tmp_path / "last")
    last_epoch = 0
    for trial in range(N_KILLS):
        proc = _spawn(path, start_epoch=last_epoch)
        try:
            first = _wait_first_write(proc)
            # kill at a random offset inside the write cadence so the
            # signal lands in different phases (serialize, renames,
            # rmtree) across trials
            time.sleep(float(rng.uniform(0.0, 0.6)))
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=30)
        finally:
            if proc.poll() is None:
                proc.kill()
            proc.stdout.close()
        e = _assert_consistent(path)
        assert e >= min(first, last_epoch or first), (e, first)
        assert e >= last_epoch, (
            f"checkpoint went BACKWARDS after kill: {e} < {last_epoch}")
        last_epoch = e

    # a fresh run resumes from the survivor and makes progress (stale
    # .tmp/.old debris from the kills must not wedge the writer)
    proc = _spawn(path, start_epoch=last_epoch)
    try:
        nxt = _wait_first_write(proc)
        assert nxt == last_epoch + 1
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
        proc.stdout.close()
    assert _assert_consistent(path) >= last_epoch
