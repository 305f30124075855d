"""Generate the end-to-end accuracy regression artifacts
(E2E_r{N}.json and E2E_r{N}_av.json).

Runs the fixed-seed CPU train+sweep pipelines defined in
tests/e2e_artifact.py and writes the metrics trees to the repo root.
Commit the files; from then on tests/test_e2e_regression.py re-runs the
identical pipelines and compares — discrete metrics (accuracy/F1)
exactly, continuous (loss/AUC) to float noise.

Run: python scripts/e2e_accuracy_artifact.py [round_number] [mvsa|av ...]
(no config names -> both; the av config needs the native ingest,
`make -C cpp`)
"""
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from tests.e2e_artifact import CONFIGS, run_e2e_pinned

    args = sys.argv[1:]
    rnd = int(args.pop(0)) if args and args[0].isdigit() else 5
    which_list = args or list(CONFIGS)
    for which in which_list:
        with tempfile.TemporaryDirectory() as td:
            history, metrics = run_e2e_pinned(td, which)
        out = {"config": CONFIGS[which], "train_history": history,
               "metrics": metrics}
        suffix = "" if which == "mvsa" else f"_{which}"
        path = os.path.join(REPO, f"E2E_r{rnd:02d}{suffix}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {path}")
        print(f"epochs run: {len(history)}; "
              f"final val_accuracy: {history[-1].get('val_accuracy')}")


if __name__ == "__main__":
    main()
