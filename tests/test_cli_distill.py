"""Distillation CLI workflow: train the teacher (Distill_tea), then train
MTD_stu / KL_stu students that load the teacher's final checkpoint — the
reference's two-phase flow (train_ddp.py:191-196)."""
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


def _argv(csv, fusion, extra=()):
    return ["--datasetName", "mvsa", "--csv_path", csv,
            "--modality_types", "language", "image",
            "--fusion_type", fusion, "--model_scale", "tiny", "--hash_tokenizer",
            "--init", "random", "--batch_size", "4",
            "--num_epochs", "1", *extra]


def test_teacher_then_students(workspace):
    from missm_tpu.cli.train import main as train_main

    best, hist = train_main(_argv(workspace, "Distill_tea"))
    assert os.path.isdir("./final_model/mvsa_Distill_tea")

    # MTD student: EMA mean teacher seeded from the Distill_tea checkpoint
    best_m, hist_m = train_main(_argv(workspace, "MTD_stu"))
    assert np.isfinite(hist_m[0]["train_loss"])
    assert os.path.isdir("./final_model/mvsa_MTD_stu")

    # KL student
    best_k, hist_k = train_main(_argv(workspace, "KL_stu"))
    assert np.isfinite(hist_k[0]["train_loss"])
