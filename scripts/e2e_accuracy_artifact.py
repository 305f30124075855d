"""Generate the end-to-end accuracy regression artifact (E2E_r{N}.json).

Runs the fixed-seed CPU train+sweep defined in tests/e2e_artifact.py and
writes the metrics tree to the repo root. Commit the file; from then on
tests/test_e2e_regression.py re-runs the identical pipeline and compares
— discrete metrics (accuracy/F1) exactly, continuous (loss/AUC) to float
noise.

Run: python scripts/e2e_accuracy_artifact.py [round_number]
"""
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def main():
    from tests.e2e_artifact import CONFIG, run_e2e_pinned

    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    with tempfile.TemporaryDirectory() as td:
        history, metrics = run_e2e_pinned(td)
    out = {"config": CONFIG, "train_history": history, "metrics": metrics}
    path = os.path.join(REPO, f"E2E_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}")
    print(f"epochs run: {len(history)}; "
          f"final val_accuracy: {history[-1].get('val_accuracy')}")


if __name__ == "__main__":
    main()
