"""Audio-visual (eNTERFACE-style) end-to-end: video+audio towers through
train_loop and the missing sweep with synthetic decode loaders."""
import os

import numpy as np
import pandas as pd
import pytest

import jax

from missm_tpu.core.config import tiny_tower
from missm_tpu.data.loaders import testing_loader, training_loader
from missm_tpu.data.missing import generate_missing_index, save_missing_index
from missm_tpu.eval.sweep import run_missing_sweep
from missm_tpu.models.finetune import ModelConfig, init_model_params
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.train.loop import train_loop
from missm_tpu.train.step import make_eval_step
from tests.synthetic import (Args, synthetic_audio_loader,
                             synthetic_video_loader)


def make_enterface_tree(root, n_train=8, n_valid=4, n_test=6):
    rng = np.random.default_rng(0)
    n = n_train + n_valid + n_test
    emotions = ["anger", "joy", "fear"]
    rows = {
        "avi_path": [f"{root}/data/s{i}/{emotions[i % 3]}/sen/a.avi"
                     for i in range(n)],
        "annotation": [emotions[rng.integers(0, 3)] for _ in range(n)],
        "mode": (["train"] * n_train + ["valid"] * n_valid
                 + ["test"] * n_test),
    }
    os.makedirs(root, exist_ok=True)
    pd.DataFrame(rows).to_csv(os.path.join(root, "label.csv"), index=False)
    idx = generate_missing_index(
        {"train": n_train, "valid": n_valid, "test": n_test},
        ["video", "audio"])
    save_missing_index(os.path.join(root, "missing_index.pkl"), idx)
    return os.path.join(root, "label.csv")


def test_av_train_and_sweep(tmp_path):
    csv = make_enterface_tree(str(tmp_path / "eNTERFACE"))
    args = Args(datasetName="eNTERFACE", modality_types=["video", "audio"],
                fusion_type="sum", batch_size=4,
                test_missing_type=["video", "audio", "mixed"])
    media = {"video": synthetic_video_loader(),
             "audio": synthetic_audio_loader()}
    tl, vl, nc = training_loader(args, csv, None, media)
    assert nc == 3
    # audio paths derive from avi paths (/data/ -> /wav/, .avi -> .wav)
    raw, _, _ = tl.dataset[0]
    assert raw["audio"].endswith(".wav") and "/wav/" in raw["audio"]

    towers = (("video", tiny_tower("video")), ("audio", tiny_tower("audio")))
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("video", "audio"),
                          output_dims=nc, feature_dims=24, fusion_dim=8)
    cfg = ModelConfig(towers=towers, fusion=fusion)
    params = init_model_params(jax.random.PRNGKey(0), cfg)

    best, hist = train_loop(params, cfg, tl, vl, num_epochs=1,
                            learning_rate=1e-3, log=lambda *a: None)
    assert np.isfinite(hist[0]["train_loss"])

    trl, test_loaders, _ = testing_loader(args, csv, None, media)
    ev = make_eval_step(cfg)
    res = run_missing_sweep(best, cfg, ev,
                            {"mixed": test_loaders["mixed"]},
                            str(tmp_path / "txt"), "eNTERFACE", "sum",
                            verbose=False)
    assert set(res["mixed"]) == {0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7,
                                 0.8, 0.9}
