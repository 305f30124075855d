"""Composed-level lever: do XLA:TPU tuning flags move the train step?

Round 4 pinned the backward at ~34% utilization with every op-family
hypothesis refuted (docs/PERF.md MFU section) — the residual is
composed-schedule quality, which is exactly what XLA's scheduler/fusion
flags control. This sweeps a small set of known levers, each in a CHILD
process (XLA_FLAGS are read at backend init), timing the b64 train step
with bench.py's methodology via scripts/train_remat_ab.py.

Flags tried (the VARIANTS dict below is the source of truth):
  baseline                 (no extra flags)
  scoped_vmem_64m/96m      --xla_tpu_scoped_vmem_limit_kib=65536/98304
  latency_hiding           --xla_latency_hiding_scheduler_rerun=2
  license_to_fuse          --xla_tpu_licm_size_inflation_ratio=2.0

Run: python scripts/xla_flags_probe.py  (takes ~10 min of compiles)
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "baseline": "",
    "scoped_vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "scoped_vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "latency_hiding": "--xla_latency_hiding_scheduler_rerun=2",
    "license_to_fuse": "--xla_tpu_licm_size_inflation_ratio=2.0",
}


def main():
    for name, flags in VARIANTS.items():
        env = dict(os.environ)
        if flags:
            # TPU backend flags ride LIBTPU_INIT_ARGS only — this jax
            # build's XLA_FLAGS parser hard-crashes on unknown (libtpu)
            # flags. NOTE: compiles run on a REMOTE compile service here;
            # if these don't reach it, variants cache-hit and match the
            # baseline exactly — that outcome means the lever is
            # environment-blocked, not neutral.
            env["LIBTPU_INIT_ARGS"] = (
                env.get("LIBTPU_INIT_ARGS", "") + " " + flags).strip()
        r = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "train_remat_ab.py"),
             "save_attn_mlp_qkv"],
            capture_output=True, text=True, timeout=2400, env=env,
            cwd=REPO)
        out = (r.stdout or "") + (r.stderr or "")
        line = [ln for ln in out.splitlines() if "samples/s/chip" in ln]
        print(f"{name:18s}: "
              f"{line[-1].split(':')[-1].strip() if line else 'FAILED'}",
              flush=True)
        if not line:
            print("    " + out[-500:].replace("\n", "\n    "), flush=True)


if __name__ == "__main__":
    main()
