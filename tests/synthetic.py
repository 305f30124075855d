"""Shared synthetic-dataset fixture: builds a tiny mvsa-style CSV tree with
fake media loaders, usable by loader tests, eval-sweep tests, and CLI smoke
tests."""
import os

import numpy as np
import pandas as pd

from missm_tpu.data.missing import generate_missing_index, save_missing_index


def make_mvsa_tree(root, n_train=12, n_valid=6, n_test=10, seed=0,
                   write_media=False):
    """Creates root/label.csv + root/missing_index.pkl. With
    write_media=True, real JPEGs are written under root/data/<ID>.jpg so
    the production decode path can run; otherwise synthetic loaders
    fabricate arrays from the path string."""
    rng = np.random.default_rng(seed)
    n = n_train + n_valid + n_test
    modes = (["train"] * n_train + ["valid"] * n_valid + ["test"] * n_test)
    rows = {
        "ID": list(range(n)),
        "language": [f"sample text number {i}" for i in range(n)],
        "annotation": [["neg", "neu", "pos"][rng.integers(0, 3)]
                       for _ in range(n)],
        "mode": modes,
    }
    os.makedirs(root, exist_ok=True)
    pd.DataFrame(rows).to_csv(os.path.join(root, "label.csv"), index=False)
    if write_media:
        from PIL import Image
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "data", f"{i}.jpg"), "JPEG")
    idx = generate_missing_index(
        {"train": n_train, "valid": n_valid, "test": n_test},
        ["language", "image"])
    save_missing_index(os.path.join(root, "missing_index.pkl"), idx)
    return os.path.join(root, "label.csv")


def synthetic_image_loader(shape=(3, 32, 32)):
    """Deterministic fake image 'decoder': array derived from the path."""
    def load(path):
        seed = abs(hash(str(path))) % (2 ** 31)
        return np.random.default_rng(seed).standard_normal(shape).astype(
            np.float32)
    return load


def synthetic_audio_loader(shape=(3, 32, 48)):
    def load(path):
        seed = abs(hash(str(path))) % (2 ** 31)
        return np.random.default_rng(seed).standard_normal(shape).astype(
            np.float32)
    return load


def synthetic_video_loader(shape=(3, 4, 32, 32)):
    def load(path):
        seed = abs(hash(str(path))) % (2 ** 31)
        return np.random.default_rng(seed).standard_normal(shape).astype(
            np.float32)
    return load


class Args:
    """Minimal args namespace mirroring the reference argparse surface."""

    def __init__(self, **kw):
        self.datasetName = "mvsa"
        self.modality_types = ["language", "image"]
        self.fusion_type = "sum"
        self.train_missing = False
        self.batch_size = 4
        self.feature_dims = 24
        self.fusion_dim = 8
        self.dropout_prob = 0.1
        self.test_missing_type = ["language", "image", "mixed"]
        self.__dict__.update(kw)
