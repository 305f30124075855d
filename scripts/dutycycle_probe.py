"""Duty-cycle proof (VERDICT r1 next-step #1): a real end-to-end train run
on the TPU, mixed-resolution JPEG media decoded by cpp/ingest.cc, through
the production CLI (`missm_tpu.cli.train`). The train loop's epoch log
prints `duty=` per epoch; the target is >0.90 with >=3 distinct source
resolutions and no mid-epoch recompiles (epoch 2+ step_ms stable ==
every program compiled in epoch 1 via the shape-bucketed transforms).

Usage:  python scripts/dutycycle_probe.py [n_train] [batch]
Writes the media tree to /tmp/duty_mvsa (reused if present).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = "/tmp/duty_mvsa"
# >=3 distinct source resolutions (landscape/portrait/square/odd sizes) —
# every one hits a different (H, W) at decode; the bucketed transform maps
# them onto a bounded program set.
RESOLUTIONS = [(360, 480), (500, 375), (300, 300), (426, 640), (280, 210)]


def build_tree(n_train, n_valid=128, n_test=64, seed=0):
    import pandas as pd
    from PIL import Image

    from missm_tpu.data.missing import (generate_missing_index,
                                        save_missing_index)

    rng = np.random.default_rng(seed)
    n = n_train + n_valid + n_test
    os.makedirs(os.path.join(ROOT, "data"), exist_ok=True)
    rows = {
        "ID": list(range(n)),
        "language": [f"a synthetic caption number {i} with some words"
                     for i in range(n)],
        "annotation": [["neg", "neu", "pos"][rng.integers(0, 3)]
                       for _ in range(n)],
        "mode": ["train"] * n_train + ["valid"] * n_valid + ["test"] * n_test,
    }
    pd.DataFrame(rows).to_csv(os.path.join(ROOT, "label.csv"), index=False)
    for i in range(n):
        h, w = RESOLUTIONS[i % len(RESOLUTIONS)]
        # realistic (compressible) content: smooth upscaled low-res noise —
        # pure per-pixel noise is a pathological JPEG decode workload
        small = rng.integers(0, 256, size=(h // 8, w // 8, 3), dtype=np.uint8)
        img = Image.fromarray(small).resize((w, h), Image.BILINEAR)
        img.save(os.path.join(ROOT, "data", f"{i}.jpg"), "JPEG", quality=85)
    idx = generate_missing_index(
        {"train": n_train, "valid": n_valid, "test": n_test},
        ["language", "image"])
    save_missing_index(os.path.join(ROOT, "missing_index.pkl"), idx)
    print(f"tree: {n} samples, {len(RESOLUTIONS)} source resolutions",
          flush=True)


def main():
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    if not os.path.exists(os.path.join(ROOT, "label.csv")):
        build_tree(n_train)

    from missm_tpu.cli.train import main as train_main
    train_main([
        "--datasetName", "mvsa", "--csv_path", os.path.join(ROOT, "label.csv"),
        "--modality_types", "language", "image",
        "--fusion_type", "sum", "--model_scale", "large", "--init", "random",
        "--hash_tokenizer",
        "--batch_size", str(batch), "--num_epochs", "3",
        "--remat", "save_attn_mlp",
        "--learning_rate", "1e-4", "--patience", "8",
        "--save_path", "/tmp/duty_ckpt", "--log_dir", "/tmp/duty_logs",
    ])


if __name__ == "__main__":
    main()
