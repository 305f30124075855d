"""Driver-contract plumbing: the dryrun layout list and the child-process
retry armor (the full dryrun itself is executed by the driver with N
virtual devices; these pin the host-side logic without paying 4 child
compiles)."""
import subprocess
import sys

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import __graft_entry__ as ge


def test_dryrun_layouts():
    # 8 devices: DP, FSDP, DP x TP, DP x pipe (both schedules) — each
    # (data, model, pipe) product must use at most 8 devices
    layouts = ge._dryrun_layouts(8)
    assert (8, 1, 1, False, "gpipe") in layouts
    assert (8, 1, 1, True, "gpipe") in layouts
    assert (4, 2, 1, False, "gpipe") in layouts
    assert (4, 1, 2, False, "gpipe") in layouts
    assert (4, 1, 2, False, "1f1b") in layouts  # memory-capped schedule
    assert (2, 2, 2, False, "gpipe") in layouts  # full 3-axis composition
    assert all(d * m * p <= 8 for d, m, p, _, _ in layouts)
    # 4 devices: 2-way TP/pipe splits but no 3-axis (needs >= 8)
    assert all(p == 1 or m == 1 for _, m, p, _, _ in ge._dryrun_layouts(4))
    # 2 devices: no TP/pipe splits (needs >= 4)
    assert ge._dryrun_layouts(2) == [(2, 1, 1, False, "gpipe"),
                                     (2, 1, 1, True, "gpipe")]


def test_dryrun_retries_only_deadlocks(monkeypatch):
    """The retry armor re-runs a child only on the known XLA:CPU
    collective-rendezvous signatures (or a hang); real failures raise on
    the first attempt."""
    calls = []

    class R:
        def __init__(self, rc, out):
            self.returncode, self.stdout, self.stderr = rc, out, ""

    def fake_run(cmd, **kw):
        calls.append(cmd)
        n = len(calls)
        if script[0] == "deadlock-then-ok":
            return R(1, "rendezvous ... Termination timeout") if n == 1 \
                else R(0, "dryrun_multichip(8): ... OK\nLAYOUT OK")
        if script[0] == "hard-failure":
            return R(1, "ValueError: bad sharding spec")
        if script[0] == "hang":
            raise subprocess.TimeoutExpired(cmd, 1800)
        return R(0, "dryrun_multichip(8): ... OK\nLAYOUT OK")

    monkeypatch.setattr(subprocess, "run", fake_run)

    script = ["ok"]
    calls.clear()
    ge.dryrun_multichip(8)
    assert len(calls) == len(ge._dryrun_layouts(8))  # one child per layout

    script = ["deadlock-then-ok"]
    calls.clear()
    # first child call deadlocks, the retry (and every later layout)
    # succeeds -> the dryrun completes with exactly one extra call
    ge.dryrun_multichip(8)
    assert len(calls) == len(ge._dryrun_layouts(8)) + 1

    script = ["hard-failure"]
    calls.clear()
    with pytest.raises(RuntimeError, match="failed"):
        ge.dryrun_multichip(8)
    assert len(calls) == 1  # no retry on a real error

    script = ["hang"]
    calls.clear()
    with pytest.raises(RuntimeError, match="failed"):
        ge.dryrun_multichip(8)
    assert len(calls) == 3  # hangs burn the full retry budget
