"""Plateau scheduler semantics (torch ReduceLROnPlateau parity) and
checkpoint-based mid-run resume (an improvement over the reference, which
restarts training from scratch — SURVEY §5)."""
import os

import numpy as np
import pytest

import jax

from missm_tpu.train.plateau import plateau_init, plateau_update


def test_plateau_matches_torch():
    torch = pytest.importorskip("torch")
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.1, patience=3)
    state = plateau_init()
    metrics = [0.5, 0.6, 0.6, 0.6, 0.6, 0.6, 0.7, 0.7, 0.7, 0.7, 0.7, 0.7,
               0.65, 0.71]
    for m in metrics:
        sched.step(m)
        state = plateau_update(state, m)
        torch_lr = opt.param_groups[0]["lr"]
        assert state.scale == pytest.approx(torch_lr), m


def test_resume_from_best_checkpoint(tmp_path):
    """Restore best ckpt (params + opt state) and keep training — losses
    continue finite and params advance."""
    from missm_tpu.core.config import tiny_tower
    from missm_tpu.models.finetune import ModelConfig, init_model_params
    from missm_tpu.models.fusion import FusionConfig
    from missm_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from missm_tpu.train.step import init_train_state, make_train_step
    from tests.test_train_step import tiny_batch, tiny_model_cfg

    cfg = tiny_model_cfg("sum")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx)
    data, labels, missing = tiny_batch()
    state, _ = step(state, data, labels, missing, 1e-3, jax.random.PRNGKey(0))

    p = str(tmp_path / "ck")
    save_checkpoint(p, {"params": state.params,
                        "opt_state": state.opt_state},
                    metadata={"epoch": 0})
    tree, meta = restore_checkpoint(p)

    # rebuild state from the restored trees and continue
    state2, tx2 = init_train_state(tree["params"], cfg)
    # re-hang restored leaves on the freshly built opt-state treedef
    _, treedef = jax.tree_util.tree_flatten(state2.opt_state)
    leaves = jax.tree_util.tree_leaves(tree["opt_state"])
    state2 = state2._replace(
        opt_state=jax.tree_util.tree_unflatten(treedef, leaves))
    step2 = make_train_step(cfg, tx2)
    state2, m = step2(state2, data, labels, missing, 1e-3,
                      jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_async_saver_roundtrip_and_order(tmp_path):
    """AsyncSaver: the write lands by wait(), a newer save for the same
    path joins the previous write first, and restore sees the LAST tree."""
    from missm_tpu.train.checkpoint import AsyncSaver, restore_checkpoint

    path = str(tmp_path / "ckpt")
    saver = AsyncSaver()
    t1 = {"w": np.arange(8, dtype=np.float32)}
    t2 = {"w": np.arange(8, dtype=np.float32) * 3.0}
    saver.save(path, t1, metadata={"epoch": 0})
    saver.save(path, t2, metadata={"epoch": 1})
    saver.wait()
    tree, meta = restore_checkpoint(path)
    np.testing.assert_array_equal(tree["w"], t2["w"])
    assert meta["epoch"] == 1


def test_async_saver_error_surfaces(tmp_path, monkeypatch):
    """A failed background write re-raises at the next wait(), not
    silently (a lost best-checkpoint must not look like a saved one)."""
    from missm_tpu.train import checkpoint as ck

    def boom(path, host_tree, metadata):
        raise OSError("disk full")
    monkeypatch.setattr(ck, "_write", boom)
    saver = ck.AsyncSaver()
    saver.save(str(tmp_path / "x"), {"w": np.zeros(2)})
    with pytest.raises(OSError, match="disk full"):
        saver.wait()
    # the error is consumed: the saver is reusable afterwards
    saver.wait()


def test_checkpoint_crash_preserves_previous_best(tmp_path):
    """A process dying with an AsyncSaver write in flight (the train
    loop raising before it reaches wait()) must not lose the PREVIOUS
    best: _write serializes to a temp dir and atomically swaps, where a
    force=True save directly onto `path` deletes the old artifact
    before the new one is durable. The child saves epoch 0, waits, then
    starts the epoch-1 save and exits immediately — the parent must
    restore a complete checkpoint (epoch 1 if the write won the race,
    epoch 0 if it died mid-write; never a corrupt or missing one)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = str(tmp_path / "crash_ckpt")
    prog = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys; sys.path.insert(0, %r); "
        "import numpy as np; "
        "from missm_tpu.train.checkpoint import AsyncSaver; "
        "s = AsyncSaver(); "
        "s.save(%r, {'w': np.zeros(6)}, metadata={'epoch': 0}); "
        "s.wait(); "
        "s.save(%r, {'w': np.ones(6)}, metadata={'epoch': 1}); "
        "raise SystemExit(7)" % (repo, path, path))
    r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                       text=True, timeout=240)
    assert r.returncode == 7, r.stderr[-2000:]
    from missm_tpu.train.checkpoint import restore_checkpoint
    tree, meta = restore_checkpoint(path)
    assert meta["epoch"] in (0, 1)
    np.testing.assert_array_equal(
        tree["w"], np.full(6, float(meta["epoch"])))


def test_async_saver_snapshot_precedes_mutation(tmp_path):
    """save() materializes on host before returning: mutating the source
    arrays afterwards must not change what lands on disk (the donated
    train step invalidates device buffers the same way)."""
    from missm_tpu.train.checkpoint import AsyncSaver, restore_checkpoint

    path = str(tmp_path / "snap")
    src = {"w": np.ones(4, dtype=np.float32)}
    saver = AsyncSaver()
    saver.save(path, src)
    src["w"] *= 100.0
    saver.wait()
    tree, _ = restore_checkpoint(path)
    np.testing.assert_array_equal(tree["w"], np.ones(4, dtype=np.float32))
