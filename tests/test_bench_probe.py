"""bench.py's tunnel-outage probe: the backend is only touched in the
main process after a child-process probe succeeds, failures back off on
the configured schedule, and a dead tunnel raises instead of hanging
(a hung init is uninterruptible once jax caches the failed backend)."""
import subprocess
import sys

import pytest


def _load_bench():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_retries_then_succeeds(monkeypatch):
    bench = _load_bench()
    calls = []

    def fake_run(cmd, timeout, check, stdout, stderr):
        calls.append((tuple(cmd[:1]), timeout))
        if len(calls) < 3:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return None

    sleeps = []
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    bench._await_backend(max_tries=5, delay=7, probe_timeout=11)
    assert len(calls) == 3                      # 2 failures + 1 success
    assert all(c == ((sys.executable,), 11) for c in calls)
    assert sleeps == [7, 7]                     # backoff between failures


def test_probe_gives_up_with_clear_error(monkeypatch):
    bench = _load_bench()

    def fake_run(cmd, timeout, check, stdout, stderr):
        raise subprocess.CalledProcessError(1, cmd)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="unavailable after 3 probe"):
        bench._await_backend(max_tries=3, delay=0, probe_timeout=5)
