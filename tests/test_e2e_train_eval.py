"""End-to-end integration: synthetic mvsa data -> train_loop (checkpoints,
plateau, early stop) -> missing-ratio sweep with reference-format txt
reports -> checkpoint reload parity."""
import os
import re

import numpy as np
import pytest

import jax

from missm_tpu.core.config import tiny_tower
from missm_tpu.data.loaders import testing_loader, training_loader
from missm_tpu.data.tokenizer import HashTokenizer
from missm_tpu.eval.sweep import format_report_block, run_missing_sweep
from missm_tpu.models.finetune import ModelConfig, init_model_params
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from missm_tpu.train.loop import train_loop
from missm_tpu.train.step import make_eval_step
from tests.synthetic import Args, make_mvsa_tree, synthetic_image_loader

pytestmark = pytest.mark.filterwarnings("ignore")


def _cfg(fusion_type="sum"):
    towers = (("image", tiny_tower("image")),)
    fusion = FusionConfig(fusion_type=fusion_type,
                          modality_types=("language", "image"),
                          output_dims=3, feature_dims=24, fusion_dim=8)
    return ModelConfig(towers=towers, fusion=fusion)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvsa")
    csv = make_mvsa_tree(str(root))
    return str(root), csv


def _loaders(csv, fusion_type="sum", batch_size=4):
    tok = HashTokenizer(99, 16)
    loaders = {"image": synthetic_image_loader()}
    args = Args(fusion_type=fusion_type, batch_size=batch_size)
    return args, tok, loaders


def test_train_loop_and_sweep(tree, tmp_path):
    root, csv = tree
    args, tok, media = _loaders(csv)
    tl, vl, nc = training_loader(args, csv, tok, media)
    cfg = _cfg("sum")
    params = init_model_params(jax.random.PRNGKey(0), cfg)

    save_dir = str(tmp_path / "ckpt")
    final = str(tmp_path / "final_model")
    best, hist = train_loop(params, cfg, tl, vl, num_epochs=2,
                            learning_rate=1e-3, save_dir=save_dir,
                            final_path=final, log=lambda *a: None)
    assert len(hist) == 2
    assert os.path.isdir(os.path.join(save_dir, "best_model"))

    # reload final artifact and run the sweep with it
    restored, meta = restore_checkpoint(final)
    rp = restored["params"]
    trl, test_loaders, _ = testing_loader(args, csv, tok, media)
    ev = make_eval_step(cfg)
    out_dir = str(tmp_path / "txt")
    results = run_missing_sweep(rp, cfg, ev, test_loaders, out_dir, "mvsa",
                                "sum", verbose=False)
    assert set(results) == {"language", "image", "mixed"}
    assert set(results["image"]) == {0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7,
                                     0.8, 0.9}

    # txt report format must match the reference writer exactly
    fname = os.path.join(out_dir, "mvsa_sum_language.txt")
    text = open(fname).read()
    blocks = [b for b in text.split("\n\n") if b.strip()]
    assert len(blocks) == 10
    pat = (r"Testing with missing ratio: [\d.]+\nTest Results:\n"
           r"Test Loss: -?\d+\.\d{4}\nTest Accuracy: \d+\.\d{4}\n"
           r"Test F1 Score: \d+\.\d{4}\nTest AUC: \d+\.\d{4}")
    for b in blocks:
        assert re.match(pat, b), b


def test_checkpoint_every_resume_exact_parity(tree, tmp_path):
    """checkpoint_every + resume_from: 2 epochs, stop, resume for 2 more
    must land bit-identical to an uninterrupted 4-epoch run — same rng
    stream, plateau scheduler, best/early-stop counters (the reference
    always restarts training from scratch, SURVEY §5)."""
    root, csv = tree
    args, tok, media = _loaders(csv)
    cfg = _cfg("sum")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    # the train step donates its state — give each run its own copy
    fresh = lambda: jax.tree_util.tree_map(np.array, params)
    quiet = lambda *a: None

    d_full = str(tmp_path / "full")
    train_loop(fresh(), cfg, *training_loader(args, csv, tok, media)[:2],
               num_epochs=4, learning_rate=1e-3, save_dir=d_full,
               checkpoint_every=1, log=quiet)

    d_half = str(tmp_path / "half")
    train_loop(fresh(), cfg, *training_loader(args, csv, tok, media)[:2],
               num_epochs=2, learning_rate=1e-3, save_dir=d_half,
               checkpoint_every=1, log=quiet)
    _, hist_res = train_loop(
        fresh(), cfg, *training_loader(args, csv, tok, media)[:2],
        num_epochs=4, learning_rate=1e-3, save_dir=d_half,
        checkpoint_every=1,
        resume_from=os.path.join(d_half, "last"), log=quiet)

    f_tree, f_meta = restore_checkpoint(os.path.join(d_full, "last"))
    h_tree, h_meta = restore_checkpoint(os.path.join(d_half, "last"))
    assert f_meta["loop"]["epoch"] == h_meta["loop"]["epoch"] == 3
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           f_tree["params"], h_tree["params"])
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           f_tree["opt_state"], h_tree["opt_state"])
    # the resumed run's history carries the restored prefix
    assert len(hist_res) == 4
    assert f_meta["loop"]["rng_key"] == h_meta["loop"]["rng_key"]
    assert f_meta["loop"]["plateau"] == h_meta["loop"]["plateau"]


def test_resume_requires_loop_state(tree, tmp_path):
    """A best_model checkpoint (no loop state) is not a resume point —
    resume_from must fail loudly, not silently restart the schedule."""
    root, csv = tree
    args, tok, media = _loaders(csv)
    cfg = _cfg("sum")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "not_resumable")
    save_checkpoint(path, {"params": params, "opt_state": {},
                           "teacher_fusion": None, "step": 0})
    with pytest.raises(ValueError, match="no loop state"):
        train_loop(params, cfg, *training_loader(args, csv, tok, media)[:2],
                   num_epochs=1, learning_rate=1e-3,
                   resume_from=path, log=lambda *a: None)


def test_report_block_format():
    m = {"loss": 1.23456, "accuracy": 0.5, "f1": 0.25, "auc": 0.75}
    assert format_report_block(0.3, m) == (
        "Testing with missing ratio: 0.3\nTest Results:\n"
        "Test Loss: 1.2346\nTest Accuracy: 0.5000\n"
        "Test F1 Score: 0.2500\nTest AUC: 0.7500\n\n")


def test_concat_statistics_sweep(tree, tmp_path):
    root, csv = tree
    args, tok, media = _loaders(csv, fusion_type="concat")
    cfg = _cfg("concat")
    params = init_model_params(jax.random.PRNGKey(1), cfg)
    trl, test_loaders, _ = testing_loader(args, csv, tok, media)
    ev = make_eval_step(cfg)
    res = run_missing_sweep(params, cfg, ev,
                            {"image": test_loaders["image"]},
                            str(tmp_path / "txt2"), "mvsa", "concat_mean",
                            train_loader=trl, verbose=False)
    assert 0.9 in res["image"]
    assert np.isfinite(res["image"][0.9]["auc"])


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    params = init_model_params(jax.random.PRNGKey(2), cfg)
    p = str(tmp_path / "ck")
    save_checkpoint(p, {"params": params}, metadata={"epoch": 3})
    tree2, meta = restore_checkpoint(p)
    assert meta["epoch"] == 3
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(tree2["params"])
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
