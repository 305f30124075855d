"""End-to-end ACCURACY regression vs the committed E2E_r{N}.json artifact.

Re-runs the exact fixed-seed train+sweep pipeline the artifact was
generated from (tests/e2e_artifact.py) and compares every metric:
discrete ones (accuracy, F1 — functions of integer prediction counts)
must match exactly; continuous ones (loss, AUC) to float noise. A future
kernel / remat / fusion / data-pipeline change that shifts learning
behavior fails HERE by name, instead of surfacing as an unexplained
bench drift. Regenerate intentionally with
scripts/e2e_accuracy_artifact.py when a numerics change is deliberate."""
import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DISCRETE = ("accuracy", "f1")


def _latest_artifact():
    paths = sorted(glob.glob(os.path.join(REPO, "E2E_r*.json")))
    if not paths:
        pytest.skip("no committed E2E_r*.json artifact")
    return paths[-1]


@pytest.mark.slow
def test_e2e_accuracy_matches_artifact(tmp_path):
    from tests.e2e_artifact import CONFIG, run_e2e_pinned

    path = _latest_artifact()
    with open(path) as f:
        ref = json.load(f)
    assert ref["config"] == CONFIG, (
        f"{os.path.basename(path)} was generated under a different e2e "
        f"config — regenerate it (scripts/e2e_accuracy_artifact.py)")

    history, metrics = run_e2e_pinned(str(tmp_path))

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
