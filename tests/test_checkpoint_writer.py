"""The process-wide serial checkpoint writer: ALL writes (every
AsyncSaver + synchronous save_checkpoint) execute on one thread in
submission order. Under jax.process_count() > 1 each write is a
COLLECTIVE (orbax save barriers + the atomic-swap barrier), so the
execution order must be the program order on every host — a per-saver
thread would let the OS pick the cross-saver order per host and pair
barriers across different writes. Single-host, the same invariant is
what makes a synchronous preemption save safe against an in-flight
async best-model write to a sibling path."""
import time

import numpy as np
import pytest

from missm_tpu.train.checkpoint import (AsyncSaver, _WRITER, read_metadata,
                                        restore_checkpoint, save_checkpoint)

pytestmark = pytest.mark.filterwarnings("ignore")


def test_writer_executes_in_submission_order():
    order = []
    j1 = _WRITER.submit(lambda: (time.sleep(0.25), order.append("slow")))
    j2 = _WRITER.submit(lambda: order.append("fast"))
    assert j2.done.wait(10)
    assert j1.done.wait(10)
    assert order == ["slow", "fast"]


def test_writer_surfaces_errors_per_job():
    j1 = _WRITER.submit(lambda: (_ for _ in ()).throw(RuntimeError("x")))
    j2 = _WRITER.submit(lambda: None)
    assert j2.done.wait(10)
    assert isinstance(j1.err, RuntimeError)
    assert j2.err is None  # one job's failure doesn't poison the next


def test_two_savers_and_sync_save_interleaved(tmp_path):
    """The train loop's exact usage: a best-model saver and a resume
    saver racing, plus a synchronous save — every artifact must land
    complete with its own metadata."""
    best, last = AsyncSaver(), AsyncSaver()
    for i in range(3):
        best.save(str(tmp_path / "best"), {"x": np.full(4, i)},
                  metadata={"i": i})
        last.save(str(tmp_path / "last"), {"x": np.full(4, 100 + i)},
                  metadata={"i": 100 + i})
    save_checkpoint(str(tmp_path / "final"), {"x": np.full(4, 7)},
                    metadata={"i": 7})
    best.wait()
    last.wait()
    for name, want in (("best", 2), ("last", 102), ("final", 7)):
        tree, meta = restore_checkpoint(str(tmp_path / name))
        np.testing.assert_array_equal(tree["x"], np.full(4, want))
        assert meta["i"] == want


def test_async_save_snapshots_metadata_at_submission(tmp_path):
    """Callers pass live structures (the loop's growing `history`); the
    JSON must capture their state AT save() time, not at write time —
    otherwise a checkpoint's metadata can describe epochs newer than its
    arrays (resume would duplicate an epoch)."""
    s = AsyncSaver()
    # park the writer so the save is QUEUED while we mutate
    _WRITER.submit(lambda: time.sleep(0.3))
    hist = [{"epoch": 0}]
    s.save(str(tmp_path / "c"), {"x": np.zeros(2)}, metadata={"h": hist})
    hist.append({"epoch": 1})  # the mutation the snapshot must not see
    s.wait()
    assert read_metadata(str(tmp_path / "c"))["h"] == [{"epoch": 0}]
