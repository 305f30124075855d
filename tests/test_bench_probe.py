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


def test_duty_children_never_raise(monkeypatch, tmp_path):
    """bench_duty (round 5): a crashing, garbage-printing, or hanging
    duty child must degrade to {mode: None} — the duty meter can never
    cost the round its primary metrics. DUTY_last.json is still written
    with whatever survived."""
    import json
    import os

    bench = _load_bench()
    monkeypatch.setattr(
        "missm_tpu.ingest.native.available", lambda: True)
    # redirect the artifact next to tmp_path by faking __file__'s dir
    monkeypatch.setattr(bench.os.path, "dirname",
                        lambda p: str(tmp_path)) if False else None

    class R:
        def __init__(self, out, rc=0):
            self.stdout, self.stderr, self.returncode = out, "", rc

    behaviors = {
        "default": R("DUTY_JSON:" + json.dumps(
            [{"epoch": 0, "duty": 0.1}, {"epoch": 1, "duty": 0.87}])),
        "uint8": None,  # raises TimeoutExpired
    }

    def fake_run(cmd, capture_output, text, timeout):
        mode = cmd[-1]
        b = behaviors[mode]
        if b is None:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return b

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.chdir(tmp_path)  # keep any relative writes inside tmp

    out = bench.bench_duty()
    assert out["default"][-1]["duty"] == 0.87
    assert out["uint8"] is None
    # artifact written next to bench.py regardless
    duty_path = os.path.join(
        os.path.dirname(os.path.abspath(bench.__file__)), "DUTY_last.json")
    with open(duty_path) as f:
        d = json.load(f)
    assert d["configs"]["uint8"] is None

    # a child that prints garbage (no DUTY_JSON line) also degrades
    behaviors["default"] = R("something went wrong", rc=1)
    behaviors["uint8"] = R("not json at all")
    out = bench.bench_duty()
    assert out == {"default": None, "uint8": None}
