"""Shared runner for the end-to-end ACCURACY regression artifact.

bench.py pins step rate; this pins LEARNING BEHAVIOR: a fixed-seed CPU
run of the full reference workflow (train to early-stop on a synthetic
mvsa tree with real JPEG media, then the complete missing-type x ratio
eval sweep, reference test.py:119-171 semantics) reduced to a JSON
metrics tree. scripts/e2e_accuracy_artifact.py commits the result as
E2E_r{N}.json; tests/test_e2e_regression.py re-runs this and compares,
so a numerics regression in any future kernel/remat/fusion change is a
named CI failure instead of a bench-drift argument."""
import json
import os
import subprocess
import sys
from typing import Tuple

SEED = 42
N_TRAIN, N_VALID, N_TEST = 24, 8, 12
EPOCHS, PATIENCE, BATCH = 5, 2, 5

CONFIG = {
    "dataset": "mvsa(synthetic, real JPEG media)",
    "split": [N_TRAIN, N_VALID, N_TEST],
    "modalities": ["language", "image"],
    "fusion_type": "sum",
    "model_scale": "tiny",
    "seed": SEED,
    "batch_size": BATCH,
    "num_epochs": EPOCHS,
    "patience": PATIENCE,
    "missing_types": ["language", "image", "mixed"],
    "devices": 1,   # pinned: the trajectory depends on topology
}

# Second corner of the benchmark (VERDICT r4 "Next round #2"): the AV
# (eNTERFACE-style) pipeline through the REAL decode path — MJPEG AVI ->
# FFmpeg -> linspace frame sampling -> temporal video tower, and WAV ->
# Kaldi-fbank mel kernel -> audio tower — with the STATEFUL concat head:
# the concat_mean test type runs the train-set statistics pass
# (reference test.py:97-115), so set_statistics + the imputation buffers
# are pinned too. A numerics change in the temporal tower, the mel
# kernel, or the stat pass fails the comparison test by name.
N_TRAIN_AV, N_VALID_AV, N_TEST_AV = 12, 6, 8
EPOCHS_AV, BATCH_AV = 3, 4

CONFIG_AV = {
    "dataset": "eNTERFACE(synthetic, real AVI+WAV media)",
    "split": [N_TRAIN_AV, N_VALID_AV, N_TEST_AV],
    "modalities": ["video", "audio"],
    "fusion_type": "concat",
    "test_types": ["concat", "concat_mean"],
    "model_scale": "tiny",
    "seed": SEED,
    "batch_size": BATCH_AV,
    "num_epochs": EPOCHS_AV,
    "patience": PATIENCE,
    "missing_types": ["video", "audio", "mixed"],
    "devices": 1,
}

CONFIGS = {"mvsa": CONFIG, "av": CONFIG_AV}


def run_e2e(workdir: str) -> Tuple[list, dict]:
    """Train + sweep in `workdir`; returns (train_history, metrics).

    metrics: {test_type: {missing_type: {ratio: {loss, accuracy, f1,
    auc}}}} with plain-float leaves (JSON-ready)."""
    from missm_tpu.cli.test import main as test_main
    from missm_tpu.cli.train import main as train_main
    from tests.synthetic import make_mvsa_tree

    data_root = os.path.join(workdir, "mvsa_multiple")
    csv = make_mvsa_tree(data_root, n_train=N_TRAIN, n_valid=N_VALID,
                         n_test=N_TEST, seed=0, write_media=True)
    run_dir = os.path.join(workdir, "run")
    os.makedirs(run_dir, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(run_dir)
    try:
        common = ["--datasetName", "mvsa", "--csv_path", csv,
                  "--modality_types", "language", "image",
                  "--fusion_type", "sum", "--model_scale", "tiny",
                  "--init", "random", "--hash_tokenizer",
                  "--seed", str(SEED)]
        _, hist = train_main(common + [
            "--batch_size", str(BATCH), "--num_epochs", str(EPOCHS),
            "--patience", str(PATIENCE), "--num_workers", "0"])
        results = test_main(common + [
            "--test_types", "sum",
            "--test_missing_type", "language", "image", "mixed",
            "--batch_size", str(BATCH)])
    finally:
        os.chdir(cwd)

    return _strip(hist, results)


def _strip(hist, results) -> Tuple[list, dict]:
    # learning-behavior fields only: the loop's timing fields (duty,
    # step_ms, wall_s, ...) are machine-dependent and would make the
    # comparison test flaky
    keep = ("epoch", "train_loss", "val_loss", "val_accuracy", "val_f1",
            "val_auc")
    history = [{k: float(h[k]) for k in keep if k in h} for h in hist]
    metrics = {
        tt: {mt: {str(ratio): {k: float(v) for k, v in m.items()}
                  for ratio, m in ratios.items()}
             for mt, ratios in by_missing.items()}
        for tt, by_missing in results.items()}
    return history, metrics


def run_e2e_av(workdir: str) -> Tuple[list, dict]:
    """The CONFIG_AV pipeline: train video+audio/concat on a synthetic
    eNTERFACE tree with real AVI+WAV media, then sweep with the plain
    concat AND the stat-pass concat_mean test types. Requires the native
    ingest (cpp/) for the AVI decode."""
    from missm_tpu.cli.test import main as test_main
    from missm_tpu.cli.train import main as train_main
    from tests.synthetic import make_enterface_media_tree

    data_root = os.path.join(workdir, "eNTERFACE")
    csv = make_enterface_media_tree(
        data_root, n_train=N_TRAIN_AV, n_valid=N_VALID_AV,
        n_test=N_TEST_AV, seed=0)
    run_dir = os.path.join(workdir, "run_av")
    os.makedirs(run_dir, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(run_dir)
    try:
        common = ["--datasetName", "eNTERFACE", "--csv_path", csv,
                  "--modality_types", "video", "audio",
                  "--fusion_type", "concat", "--model_scale", "tiny",
                  "--init", "random", "--hash_tokenizer",
                  "--seed", str(SEED)]
        _, hist = train_main(common + [
            "--batch_size", str(BATCH_AV), "--num_epochs", str(EPOCHS_AV),
            "--patience", str(PATIENCE), "--num_workers", "0"])
        results = test_main(common + [
            "--test_types", "concat", "concat_mean",
            "--test_missing_type", "video", "audio", "mixed",
            "--batch_size", str(BATCH_AV)])
    finally:
        os.chdir(cwd)
    return _strip(hist, results)


def run_e2e_pinned(workdir: str, which: str = "mvsa") -> Tuple[list, dict]:
    """Run the e2e in a CHILD process pinned to ONE CPU device.

    The trajectory depends on the device topology (--batch_size is
    per-chip, so 8 virtual devices mean an 8x global batch) — the
    artifact and every comparison run must use the identical topology,
    and the pytest process carries the conftest's 8-device XLA_FLAGS."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    fn = {"mvsa": "run_e2e", "av": "run_e2e_av"}[which]
    out_json = os.path.join(workdir, "e2e_out.json")
    prog = (
        "import jax, sys, json; jax.config.update('jax_platforms', 'cpu'); "
        f"sys.path.insert(0, {repo!r}); "
        f"from tests.e2e_artifact import {fn}; "
        f"h, m = {fn}({workdir!r}); "
        f"json.dump({{'history': h, 'metrics': m}}, "
        f"open({out_json!r}, 'w'))")
    r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                       text=True, timeout=1200, env=env, cwd=repo)
    if r.returncode != 0:
        raise RuntimeError(f"e2e child failed:\n{(r.stdout + r.stderr)[-3000:]}")
    with open(out_json) as f:
        out = json.load(f)
    return out["history"], out["metrics"]
