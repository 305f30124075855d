"""Named regression marker for the XLA:CPU collective-interlock hazard.

The hazard (docs/STATUS_round3.md, __graft_entry__.dryrun_multichip
docstring): XLA:CPU's thunk executor runs independent collectives
dataflow-ordered, not program-ordered, so a program mixing ppermute with
psums across several independent subgraphs (the GPipe pipe layout) can
interlock into a cross-device rendezvous deadlock that CHECK-aborts the
process after ~40 s. Observed ~1/3 of runs on the (4, 1, 2) dryrun pipe
layout. TPU executes collectives in program order per core and is
architecturally immune; the CPU-side armor is the retried child process.

This test exists so that a jax/libtpu/XLA upgrade that CHANGES the
emulation behavior surfaces as a NAMED failure instead of being
re-diagnosed from scratch: it runs the real pipe layout in K real child
processes and asserts every outcome falls in the two known classes —
clean success or the known rendezvous-abort signature. A third outcome
class (new error text, new hang mode) fails here with the child output
attached.

K runs are probabilistic cover (P(no deadlock in 4 runs) ≈ (2/3)^4 ≈
0.2), so zero observed deadlocks is NOT a failure — but at least one
run must SUCCEED (the armor's premise: the deadlock is transient, a
retry makes progress)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__graft_entry__.py")
K = int(os.environ.get("INTERLOCK_RUNS", "4"))

# the known rendezvous-deadlock signature. Deliberately narrow: a
# marker like "participants" appears in unrelated collective error
# texts and would silently classify NEW failure modes as the known
# deadlock — the third-outcome detection this test exists for
DEADLOCK_MARKERS = ("rendezvous", "Rendezvous")


def _run_pipe_layout_child(timeout=900):
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    try:
        r = subprocess.run(
            [sys.executable, ENTRY, "dryrun-layout", "8", "4,1,2,0"],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=REPO)
        return r.returncode, (r.stdout or "") + (r.stderr or "")
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode(errors="replace")
               if isinstance(e.stdout, bytes) else (e.stdout or ""))
        return -9, "CHILD TIMEOUT\n" + out


@pytest.mark.slow
def test_pipe_layout_interlock_classes():
    outcomes = []
    for i in range(K):
        rc, out = _run_pipe_layout_child()
        if rc == 0 and "LAYOUT OK" in out:
            outcomes.append("ok")
        elif any(m in out for m in DEADLOCK_MARKERS):
            outcomes.append("deadlock")
        else:
            pytest.fail(
                f"pipe-layout child run {i + 1}/{K} failed OUTSIDE the two "
                f"known outcome classes (clean success / XLA:CPU "
                f"collective-rendezvous abort). The XLA collective "
                f"emulation behavior has changed — re-evaluate the "
                f"dryrun retry armor (__graft_entry__.dryrun_multichip).\n"
                f"returncode={rc}\n--- child output tail ---\n{out[-3000:]}")
    assert "ok" in outcomes, (
        f"every pipe-layout run deadlocked ({outcomes}) — the hazard is "
        f"no longer transient; the retried-child armor cannot make "
        f"progress and the GPipe CPU validation strategy needs rework")
    # record the observed rate for the curious (pytest -rP shows it)
    print(f"interlock outcomes over {K} runs: {outcomes}")
