"""CLI smoke tests: the full train and test entry points, tiny scale,
real JPEG decode through the production media-loader path."""
import os

import numpy as np
import pytest

from tests.synthetic import make_mvsa_tree


@pytest.fixture()
def workspace(tmp_path, monkeypatch):
    data_root = tmp_path / "mvsa_multiple"
    csv = make_mvsa_tree(str(data_root), write_media=True)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)
    return csv


def test_train_then_test_cli(workspace):
    from missm_tpu.cli.train import main as train_main
    from missm_tpu.cli.test import main as test_main

    argv = ["--datasetName", "mvsa", "--csv_path", workspace,
            "--modality_types", "language", "image",
            "--fusion_type", "sum", "--model_scale", "tiny", "--hash_tokenizer",
            "--init", "random", "--batch_size", "4",
            "--num_epochs", "1", "--num_workers", "0",
            "--frozen_bf16"]  # also exercises the cast_frozen wiring
    best, hist = train_main(argv)
    assert len(hist) == 1
    assert os.path.isdir("./final_model/mvsa_sum")

    argv_t = ["--datasetName", "mvsa", "--csv_path", workspace,
              "--modality_types", "language", "image",
              "--fusion_type", "sum", "--test_types", "sum",
              "--test_missing_type", "language", "image", "mixed",
              "--model_scale", "tiny", "--hash_tokenizer", "--batch_size", "8"]
    results = test_main(argv_t)
    assert set(results["sum"]) == {"language", "image", "mixed"}
    assert os.path.exists("./new_txt_experiment/mvsa_sum_language.txt")
    for mt, per_ratio in results["sum"].items():
        for r, m in per_ratio.items():
            assert np.isfinite(m["accuracy"])


def test_train_cli_profile_dir(tmp_path, monkeypatch):
    """--profile_dir captures a jax.profiler trace of steady-state steps
    (epoch-0 batches 4-6) viewable in Perfetto/TensorBoard-profile.

    batch_size is PER DEVICE (8 virtual devices in the suite), so the
    tree needs >= 4 * 8 rows for the trace window to open; 40 rows at
    batch 1 give 5 batches — the epoch-end safety stop closes the
    window."""
    from missm_tpu.cli.train import main as train_main

    data_root = tmp_path / "mvsa_multiple"
    csv = make_mvsa_tree(str(data_root), n_train=40, write_media=True)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)

    prof = str(tmp_path / "trace")
    argv = ["--datasetName", "mvsa", "--csv_path", csv,
            "--modality_types", "language", "image",
            "--fusion_type", "sum", "--model_scale", "tiny",
            "--hash_tokenizer", "--init", "random", "--batch_size", "1",
            "--num_epochs", "1", "--num_workers", "0",
            "--profile_dir", prof]
    train_main(argv)
    hits = [os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs]
    assert hits, f"no trace files written under {prof}"
