"""Predict CLI: train tiny model, then batch-infer the test split."""
import os

import pandas as pd
import pytest

from tests.synthetic import make_mvsa_tree


@pytest.fixture()
def workspace(tmp_path, monkeypatch):
    csv = make_mvsa_tree(str(tmp_path / "mvsa_multiple"), write_media=True)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)
    return csv


def test_predict_cli(workspace):
    from missm_tpu.cli.train import main as train_main
    from missm_tpu.cli.predict import main as predict_main

    train_main(["--datasetName", "mvsa", "--csv_path", workspace,
                "--modality_types", "language", "image",
                "--fusion_type", "sum", "--model_scale", "tiny", "--hash_tokenizer",
                "--init", "random", "--batch_size", "4",
                "--num_epochs", "1"])

    out = predict_main(["--datasetName", "mvsa", "--csv_path", workspace,
                        "--modality_types", "language", "image",
                        "--fusion_type", "sum", "--model_scale", "tiny", "--hash_tokenizer",
                        "--batch_size", "8",
                        "--split", "test", "--output", "preds.csv"])
    assert os.path.exists("preds.csv")
    df = pd.read_csv("preds.csv")
    assert len(df) == 10
    assert set(df.columns) == {"index", "label", "pred", "confidence"}
    assert (df["confidence"] > 0).all()
