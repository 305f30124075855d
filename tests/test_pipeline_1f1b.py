"""--pipe_schedule 1f1b: the memory-capped pipeline schedule
(parallel.pipeline._pipeline_1f1b) pinned math-identical to DP and to
the gpipe schedule — forward parity, two-train-step parity, composition
with remat and the temporal tower, and the extras (text key-bias)
cotangent path. Mirrors tests/test_pipeline.py."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.core.config import tiny_tower
from missm_tpu.core.mesh import make_mesh
from missm_tpu.models.finetune import (
    ModelConfig, init_model_params, model_forward,
)
from missm_tpu.parallel import PipeConfig, partition_params, shard_batch
from missm_tpu.train.step import init_train_state, make_train_step

from tests.test_pipeline import batch, model_cfg


def _pipe_cfg(cfg, mesh, **kw):
    return dataclasses.replace(
        cfg, pipe=PipeConfig(mesh, schedule="1f1b", **kw))


def test_1f1b_fwd_parity():
    """Forward through the 1f1b schedule (the custom-VJP primal) matches
    the plain scan — incl. the temporal video tower (grouped
    microbatches) and the text tower's key-bias extra."""
    cfg = model_cfg()
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    data, labels, missing = batch(with_mask=True)

    ref, _ = jax.jit(lambda p, d, m: model_forward(p, cfg, d, m))(
        params, data, missing)

    mesh = make_mesh(n_data=2, n_model=1, n_pipe=2)
    cfg_pp = _pipe_cfg(cfg, mesh, n_pipe=2)
    pp = partition_params(params, mesh, pipe=True)
    out, _ = jax.jit(lambda p, d, m: model_forward(p, cfg_pp, d, m))(
        pp, shard_batch(data, mesh), missing)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5, rtol=1e-5)


def test_1f1b_matches_dp_numerics():
    """Two train steps under (data=4, pipe=2, M=4, schedule=1f1b) produce
    the same loss and updated params as pure DP — the custom-VJP reverse
    schedule delivers the same block/input/extra gradients autodiff
    would."""
    cfg = model_cfg("sum")
    base = init_model_params(jax.random.PRNGKey(0), cfg)
    data, labels, missing = batch()

    results = []
    for n_pipe in (1, 2):
        mesh = make_mesh(n_data=8 // n_pipe, n_model=1, n_pipe=n_pipe)
        c = cfg if n_pipe == 1 else _pipe_cfg(cfg, mesh, n_pipe=2,
                                              microbatches=4)
        params = partition_params(
            jax.tree_util.tree_map(lambda x: x + 0.0, base), mesh,
            pipe=n_pipe > 1)
        state, tx = init_train_state(params, c)
        step = make_train_step(c, tx)
        d = shard_batch(data, mesh)
        for i in range(2):
            state, m = step(state, d, labels, missing, 1e-2,
                            jax.random.PRNGKey(i))
        if n_pipe > 1:
            w = state.params["encoder"]["image"]["vision"]["blocks"]["mlp"][
                "fc1"]["w"]
            assert "pipe" in str(w.sharding.spec), (
                "pipe sharding lost through the 1f1b train step")
        results.append((float(m["loss"]),
                        np.asarray(
                            state.params["fusion"]["proj"]["image"]["w"])))

    (loss_dp, w_dp), (loss_pp, w_pp) = results
    assert loss_dp == pytest.approx(loss_pp, rel=1e-5)
    np.testing.assert_allclose(w_dp, w_pp, atol=1e-5, rtol=1e-4)


def test_1f1b_composes_with_tp_and_remat():
    """(data=2, model=2, pipe=2) under the 1F1B schedule: the
    hand-scheduled custom-VJP reverse pipeline claims data/model stay
    AUTO axes through the manual pipe region — the 3-axis composition
    (Megatron-TP shardings riding through, jax.checkpoint inside the
    pipeline body) is where that claim is most likely to break. Loss
    must match the pure-DP step. Mirrors
    test_pipeline.test_pipeline_composes_with_tp_and_remat."""
    cfg = model_cfg("concat", remat="save_attn")
    base = init_model_params(jax.random.PRNGKey(0), cfg)
    data, labels, missing = batch()

    mesh_dp = make_mesh()  # 8 x 1
    params = partition_params(
        jax.tree_util.tree_map(lambda x: x + 0.0, base), mesh_dp)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx)
    state, m_dp = step(state, shard_batch(data, mesh_dp), labels, missing,
                       1e-2, jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=2, n_model=2, n_pipe=2)
    c = _pipe_cfg(cfg, mesh, n_pipe=2)
    params = partition_params(
        jax.tree_util.tree_map(lambda x: x + 0.0, base), mesh,
        tp=True, pipe=True)
    w = params["encoder"]["image"]["vision"]["blocks"]["mlp"]["fc1"]["w"]
    assert w.sharding.spec[0] == "pipe" and "model" in str(w.sharding.spec)
    state, tx = init_train_state(params, c)
    step = make_train_step(c, tx)
    state, m_pp = step(state, shard_batch(data, mesh), labels, missing,
                       1e-2, jax.random.PRNGKey(0))
    assert float(m_dp["loss"]) == pytest.approx(float(m_pp["loss"]),
                                                rel=1e-5)


def test_1f1b_matches_gpipe_grads():
    """Same pipelined model, gpipe vs 1f1b: per-leaf gradients agree —
    the two schedules are the same math, different residual policy.
    Checked directly on jax.grad of the pipelined forward (block grads,
    not just the composed train step)."""
    cfg = model_cfg("sum", remat=True)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    data, labels, missing = batch()
    mesh = make_mesh(n_data=2, n_model=1, n_pipe=2)
    pp = partition_params(params, mesh, pipe=True)
    d = shard_batch(data, mesh)

    def loss_fn(cfg_x):
        def f(p):
            logits, _ = model_forward(p, cfg_x, d, missing)
            return jnp.mean(
                (logits - jax.nn.one_hot(labels, logits.shape[-1])) ** 2)
        return f

    g_ref = jax.jit(jax.grad(loss_fn(dataclasses.replace(
        cfg, pipe=PipeConfig(mesh, n_pipe=2)))))(pp)
    g_new = jax.jit(jax.grad(loss_fn(_pipe_cfg(cfg, mesh, n_pipe=2))))(pp)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(g_new))
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_new[path]),
            atol=1e-6, rtol=1e-4, err_msg=jax.tree_util.keystr(path))


def test_1f1b_four_stage_deep_tower():
    """S=4, M=8 on an 8-layer tower: multi-hop cotangent rotation through
    the reverse schedule. Grad-of-sum parity vs the plain (n_pipe=1)
    scan on the raw pipeline primitive — no fusion head, isolating the
    schedule itself (incl. bubble-tick masking at both ends)."""
    from missm_tpu.parallel.pipeline import pipeline_blocks

    L, D = 8, 16
    rng = np.random.default_rng(0)
    blocks = {"w": jnp.asarray(rng.standard_normal((L, D, D)) * 0.1,
                               jnp.float32),
              "b": jnp.asarray(rng.standard_normal((L, D)) * 0.1,
                               jnp.float32)}
    x = jnp.asarray(rng.standard_normal((16, 5, D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((16, 5, D)) * 0.1, jnp.float32)

    def block_fn(bl, h, e):
        def body(h, p):
            return jnp.tanh(h @ p["w"] + p["b"] + e), None
        h, _ = jax.lax.scan(body, h, bl)
        return h

    def plain(blocks, x, bias):
        return block_fn(blocks, x, bias)

    mesh = make_mesh(n_data=2, n_model=1, n_pipe=4)
    pipe = PipeConfig(mesh, n_pipe=4, microbatches=8, schedule="1f1b")

    def piped(blocks, x, bias):
        return pipeline_blocks(pipe, blocks, x, (bias,), block_fn=block_fn)

    def scalar(f):
        return lambda b, xx, e: jnp.sum(jnp.sin(f(b, xx, e)))

    y_ref = jax.jit(plain)(blocks, x, bias)
    y_new = jax.jit(piped)(blocks, x, bias)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_new),
                               atol=1e-5, rtol=1e-5)

    g_ref = jax.jit(jax.grad(scalar(plain), argnums=(0, 1, 2)))(
        blocks, x, bias)
    g_new = jax.jit(jax.grad(scalar(piped), argnums=(0, 1, 2)))(
        blocks, x, bias)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_1f1b_cli_flag():
    """--pipe_schedule reaches the PipeConfig the model runs with."""
    from missm_tpu.cli.common import build_model_config
    from missm_tpu.compat.args import train_args

    mesh = make_mesh(n_data=4, n_model=1, n_pipe=2)
    args = train_args(["--mesh_pipe", "2", "--pipe_schedule", "1f1b",
                       "--modality_types", "language", "image",
                       "--model_scale", "tiny"])
    cfg = build_model_config(args, num_classes=3, mesh=mesh)
    assert cfg.pipe.schedule == "1f1b"
    with pytest.raises(SystemExit):
        train_args(["--pipe_schedule", "zigzag"])


def test_unknown_schedule_is_loud():
    from missm_tpu.parallel.pipeline import pipeline_blocks

    mesh = make_mesh(n_data=4, n_model=1, n_pipe=2)
    with pytest.raises(ValueError, match="unknown pipe schedule"):
        pipeline_blocks(PipeConfig(mesh, 2, schedule="zigzag"),
                        {"w": jnp.zeros((2, 4, 4))}, jnp.zeros((8, 5, 4)),
                        block_fn=lambda b, h: h)
