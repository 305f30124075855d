"""Child body for the checkpoint fault-injection test: write checkpoints
to <dir>/last back-to-back forever, each with a tree whose content is
derivable from its metadata (epoch e -> array filled with e), so the
parent can assert any surviving checkpoint is internally consistent
after a SIGKILL. Prints 'WROTE <e>' after each landed write."""
import sys

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, sys.argv[2])
from missm_tpu.train.checkpoint import save_checkpoint  # noqa: E402


def main():
    path = sys.argv[1]
    e = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    while True:
        e += 1
        tree = {
            "epoch_arr": np.full((64, 64), float(e), np.float32),
            "nested": {"w": np.full((8,), float(e) * 2.0, np.float32)},
        }
        save_checkpoint(path, tree, metadata={"epoch": e})
        print(f"WROTE {e}", flush=True)


if __name__ == "__main__":
    main()
