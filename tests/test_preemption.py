"""Graceful SIGTERM preemption: the train loop stops at a batch
boundary, lands a resume checkpoint at save_dir/last, and raises
PreemptedError; --resume auto then continues the run. Covers both stop
points: mid-epoch (partial updates kept, epoch re-runs) and
between-epoch (bit-exact resume, same guarantees as checkpoint_every).
Reference has no preemption story at all (train_ddp.py restarts from
scratch); SURVEY §5 checkpoint/resume."""
import os
import signal

import numpy as np
import pytest

import jax

from missm_tpu.core.config import tiny_tower
from missm_tpu.data.loaders import training_loader
from missm_tpu.data.tokenizer import HashTokenizer
from missm_tpu.models.finetune import ModelConfig, init_model_params
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.train.checkpoint import read_metadata, restore_checkpoint
from missm_tpu.train.loop import PreemptedError, train_loop
from tests.synthetic import Args, make_mvsa_tree, synthetic_image_loader

pytestmark = pytest.mark.filterwarnings("ignore")

quiet = lambda *a: None


def _cfg():
    towers = (("image", tiny_tower("image")),)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=3, feature_dims=24, fusion_dim=8)
    return ModelConfig(towers=towers, fusion=fusion)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvsa_pre")
    # 24 train samples = 6 batches/epoch: enough slack that the
    # cross-thread SIGTERM (raised at prefetch time of batch `after`)
    # is always observed by the main loop before the epoch ends
    csv = make_mvsa_tree(str(root), n_train=24)
    return str(root), csv


def _setup(csv):
    tok = HashTokenizer(99, 16)
    media = {"image": synthetic_image_loader()}
    args = Args(fusion_type="sum", batch_size=4)
    return args, tok, media


class _SigtermOnEpoch:
    """Loader wrapper: raises SIGTERM in-process partway through
    iteration number `epoch` (0-based count of iterations of THIS
    wrapper). The raise happens in whatever thread iterates (the
    prefetch worker for the train loader) — CPython still runs the
    Python-level handler on the main thread, which is exactly the
    production delivery path."""

    def __init__(self, loader, epoch: int, after: int = 0):
        self.loader = loader
        self.batch_size = loader.batch_size
        self.epoch = epoch
        self.after = after
        self._iters = -1

    def __iter__(self):
        self._iters += 1
        for i, b in enumerate(self.loader):
            if self._iters == self.epoch and i == self.after:
                signal.raise_signal(signal.SIGTERM)
            yield b


def test_sigterm_mid_epoch_checkpoints_and_resumes(tree, tmp_path):
    root, csv = tree
    args, tok, media = _setup(csv)
    cfg = _cfg()
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    save_dir = str(tmp_path / "ckpt")

    tl, vl, _ = training_loader(args, csv, tok, media)
    with pytest.raises(PreemptedError):
        train_loop(params, cfg, _SigtermOnEpoch(tl, epoch=1, after=1), vl,
                   num_epochs=3, learning_rate=1e-3, save_dir=save_dir,
                   log=quiet)

    last = os.path.join(save_dir, "last")
    meta = read_metadata(last)
    assert meta["preempted"]["epoch"] == 1
    assert meta["preempted"]["batches_done"] >= 1
    # epoch 0 completed; the interrupted epoch 1 re-runs on resume
    assert meta["loop"]["epoch"] == 0
    assert len(meta["loop"]["history"]) == 1

    # resume finishes the remaining epochs (1 re-run + 2)
    tl2, vl2, _ = training_loader(args, csv, tok, media)
    params2 = init_model_params(jax.random.PRNGKey(0), cfg)
    best, hist = train_loop(params2, cfg, tl2, vl2, num_epochs=3,
                            learning_rate=1e-3, save_dir=save_dir,
                            resume_from=last, log=quiet)
    assert [h["epoch"] for h in hist] == [0, 1, 2]
    assert all(np.isfinite(h["train_loss"]) for h in hist)
    # the handler was uninstalled on exit from both runs
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL


def test_sigterm_between_epochs_resumes_exactly(tree, tmp_path):
    """Signal landing during epoch 1's eval: epoch 1 completes fully, the
    stop is taken at the top of epoch 2 — resuming must be bit-identical
    to an uninterrupted run (same rng stream, plateau, counters), i.e.
    the SIGTERM path inherits checkpoint_every's exactness."""
    root, csv = tree
    args, tok, media = _setup(csv)
    cfg = _cfg()
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    fresh = lambda: jax.tree_util.tree_map(np.array, params)

    d_full = str(tmp_path / "full")
    train_loop(fresh(), cfg, *training_loader(args, csv, tok, media)[:2],
               num_epochs=4, learning_rate=1e-3, save_dir=d_full,
               checkpoint_every=1, log=quiet)

    d_half = str(tmp_path / "half")
    tl, vl, _ = training_loader(args, csv, tok, media)
    # valid loader iteration 1 == epoch 1's eval pass
    with pytest.raises(PreemptedError):
        train_loop(fresh(), cfg, tl, _SigtermOnEpoch(vl, epoch=1),
                   num_epochs=4, learning_rate=1e-3, save_dir=d_half,
                   log=quiet)
    meta = read_metadata(os.path.join(d_half, "last"))
    assert meta["loop"]["epoch"] == 1  # both epochs 0 and 1 completed
    assert meta["preempted"]["batches_done"] == 0  # no partial epoch

    train_loop(fresh(), cfg, *training_loader(args, csv, tok, media)[:2],
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
    assert f_meta["loop"]["rng_key"] == h_meta["loop"]["rng_key"]
    assert f_meta["loop"]["plateau"] == h_meta["loop"]["plateau"]
    # the python `random` stream resumes from the checkpointed position
    # (the datasets' train-missing draws consume it)
    assert f_meta["loop"]["py_random"] == h_meta["loop"]["py_random"]


class _DrawRecorder:
    """Loader wrapper that consumes one process-global `random` draw per
    batch — a stand-in for the datasets' train_missing / retrieval
    random.choice draws (data/datasets.py:120-128)."""

    def __init__(self, loader, draws: list):
        self.loader = loader
        self.batch_size = loader.batch_size
        self.draws = draws

    def __iter__(self):
        import random as _r
        for b in self.loader:
            self.draws.append(_r.random())
            yield b


def test_resume_continues_python_random_stream(tree, tmp_path):
    """An uninterrupted run and a stop+resume run must present the SAME
    sequence of process-global `random` draws to the data pipeline —
    restoring only the jax key would replay the stream from its seed and
    give the resumed epochs different missing patterns than the
    uninterrupted twin."""
    import random as _r
    root, csv = tree
    args, tok, media = _setup(csv)
    cfg = _cfg()
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    fresh = lambda: jax.tree_util.tree_map(np.array, params)

    _r.seed(123)
    full_draws = []
    tl, vl, _ = training_loader(args, csv, tok, media)
    train_loop(fresh(), cfg, _DrawRecorder(tl, full_draws), vl,
               num_epochs=4, learning_rate=1e-3,
               save_dir=str(tmp_path / "full"), checkpoint_every=1,
               log=quiet)

    _r.seed(123)
    half_draws = []
    tl, vl, _ = training_loader(args, csv, tok, media)
    train_loop(fresh(), cfg, _DrawRecorder(tl, half_draws), vl,
               num_epochs=2, learning_rate=1e-3,
               save_dir=str(tmp_path / "half"), checkpoint_every=1,
               log=quiet)
    _r.seed(999)  # resume must restore the position, not trust the seed
    tl, vl, _ = training_loader(args, csv, tok, media)
    train_loop(fresh(), cfg, _DrawRecorder(tl, half_draws), vl,
               num_epochs=4, learning_rate=1e-3,
               save_dir=str(tmp_path / "half"), checkpoint_every=1,
               resume_from=str(tmp_path / "half" / "last"), log=quiet)

    assert len(full_draws) == len(half_draws)
    assert full_draws == half_draws


def test_resume_auto_recovers_from_old_dir(tmp_path, monkeypatch):
    """A crash between _write's two renames leaves only last.old.
    `--resume auto` must treat that as resumable: a fresh restart would
    train from epoch 0 AND rmtree the .old on its first checkpoint
    write — silently destroying the one recoverable artifact in exactly
    the window the atomic swap exists for."""
    from missm_tpu.cli.train import main as train_main

    data_root = tmp_path / "mvsa_multiple"
    csv = make_mvsa_tree(str(data_root), write_media=True)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)

    argv = ["--datasetName", "mvsa", "--csv_path", csv,
            "--modality_types", "language", "image",
            "--fusion_type", "sum", "--model_scale", "tiny",
            "--hash_tokenizer", "--init", "random", "--batch_size", "4",
            "--num_epochs", "2", "--num_workers", "0",
            "--checkpoint_every", "1"]
    train_main(argv)
    last = "./experiments/mvsa_sum/checkpoints/last"
    assert os.path.isdir(last)
    os.rename(last, last + ".old")  # simulate the mid-swap crash

    best, hist = train_main(argv + ["--resume", "auto"])
    # resumed at epoch 2 == num_epochs: zero epochs to train, the
    # restored history comes back, and nothing rewrote `last` — a fresh
    # restart would have re-trained 2 epochs and rmtree'd the .old
    assert [h["epoch"] for h in hist] == [0, 1]
    assert not os.path.isdir(last)
    assert os.path.isdir(last + ".old")
