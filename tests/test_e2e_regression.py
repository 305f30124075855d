"""End-to-end ACCURACY regression vs the committed E2E_r{N}*.json artifacts.

Re-runs the exact fixed-seed train+sweep pipelines the artifacts were
generated from (tests/e2e_artifact.py) and compares every metric:
discrete ones (accuracy, F1 — functions of integer prediction counts)
must match exactly; continuous ones (loss, AUC) to float noise. A future
kernel / remat / fusion / data-pipeline change that shifts learning
behavior fails HERE by name, instead of surfacing as an unexplained
bench drift. Two corners are pinned: the image+language/sum config
(E2E_r{N}.json) and the AV real-decode + stateful concat_mean config
(E2E_r{N}_av.json — temporal tower, mel kernel, statistics pass).
Regenerate intentionally with scripts/e2e_accuracy_artifact.py when a
numerics change is deliberate."""
import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DISCRETE = ("accuracy", "f1")

PATTERNS = {"mvsa": "E2E_r[0-9][0-9].json", "av": "E2E_r[0-9][0-9]_av.json"}


def _latest_artifact(which):
    paths = sorted(glob.glob(os.path.join(REPO, PATTERNS[which])))
    if not paths:
        pytest.skip(f"no committed {PATTERNS[which]} artifact")
    return paths[-1]


@pytest.mark.slow
@pytest.mark.parametrize("which", ["mvsa", "av"])
def test_e2e_accuracy_matches_artifact(tmp_path, which):
    from tests.e2e_artifact import CONFIGS, run_e2e_pinned

    if which == "av":
        from missm_tpu.ingest import native
        if not native.available():
            pytest.skip("native ingest not built (make -C cpp)")

    path = _latest_artifact(which)
    with open(path) as f:
        ref = json.load(f)
    assert ref["config"] == CONFIGS[which], (
        f"{os.path.basename(path)} was generated under a different e2e "
        f"config — regenerate it (scripts/e2e_accuracy_artifact.py)")

    history, metrics = run_e2e_pinned(str(tmp_path), which)

    assert len(history) == len(ref["train_history"]), (
        "early-stop trajectory changed: "
        f"{len(history)} epochs vs artifact {len(ref['train_history'])}")
    for got, want in zip(history, ref["train_history"]):
        for k, v in want.items():
            assert got[k] == pytest.approx(v, rel=1e-4, abs=1e-5), (
                f"train history field {k}: {got[k]} vs artifact {v}")

    for tt, by_missing in ref["metrics"].items():
        for mt, ratios in by_missing.items():
            for ratio, want in ratios.items():
                got = metrics[tt][mt][ratio]
                for k, v in want.items():
                    where = f"{tt}/{mt}/ratio={ratio}/{k}"
                    if k in DISCRETE:
                        assert got[k] == pytest.approx(v, abs=1e-9), (
                            f"{where}: {got[k]} vs artifact {v} — "
                            f"predictions changed")
                    else:
                        assert got[k] == pytest.approx(
                            v, rel=1e-4, abs=5e-4), (
                            f"{where}: {got[k]} vs artifact {v}")
