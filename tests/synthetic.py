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


def make_enterface_media_tree(root, n_train=12, n_valid=6, n_test=10,
                              seed=0, n_frames=10, wav_seconds=0.8):
    """eNTERFACE-style tree with REAL media: MJPEG AVI clips under
    root/data/s<i>/<emotion>/sen/a.avi and 16 kHz mono PCM WAVs at the
    derived /wav/ path (the reference's convention: audio path = avi path
    with /data/ -> /wav/ and .avi -> .wav, data_loader.py:137-139). Media
    content is deterministic in `seed`, so the full production decode
    path (FFmpeg MJPEG decode + linspace frame sampling + wav -> Kaldi
    fbank) is reproducible for the e2e accuracy artifact."""
    import io
    import wave

    from PIL import Image

    from tests.avi_writer import write_mjpeg_avi

    rng = np.random.default_rng(seed)
    n = n_train + n_valid + n_test
    emotions = ["anger", "joy", "fear"]
    avi_paths, annotations = [], []
    for i in range(n):
        emo = emotions[int(rng.integers(0, 3))]
        rel = os.path.join("data", f"s{i}", emo, "sen", "a.avi")
        avi = os.path.join(root, rel)
        os.makedirs(os.path.dirname(avi), exist_ok=True)
        frames = []
        for _ in range(n_frames):
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 256, (48, 64, 3),
                                         dtype=np.uint8)
                            ).save(buf, "JPEG", quality=90)
            frames.append(buf.getvalue())
        write_mjpeg_avi(avi, frames, 64, 48)
        wav = avi.replace(os.sep + "data" + os.sep,
                          os.sep + "wav" + os.sep)[:-4] + ".wav"
        os.makedirs(os.path.dirname(wav), exist_ok=True)
        sr = 16000
        t = np.arange(int(sr * wav_seconds)) / sr
        tone = (np.sin(2 * np.pi * (200 + 40 * (i % 5)) * t)
                + 0.3 * rng.standard_normal(t.shape))
        pcm = (np.clip(tone, -1, 1) * 0.5 * 32767).astype("<i2")
        with wave.open(wav, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        avi_paths.append(avi)
        annotations.append(emo)
    rows = {
        "avi_path": avi_paths,
        "annotation": annotations,
        "mode": (["train"] * n_train + ["valid"] * n_valid
                 + ["test"] * n_test),
    }
    pd.DataFrame(rows).to_csv(os.path.join(root, "label.csv"), index=False)
    idx = generate_missing_index(
        {"train": n_train, "valid": n_valid, "test": n_test},
        ["video", "audio"])
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
