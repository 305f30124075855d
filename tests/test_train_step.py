"""End-to-end train/eval step tests on the 8-device virtual CPU mesh:
DP sharding, DP+TP sharding, distillation variants, trainability masks,
loss parity vs torch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.core.config import MODALITY_CODES, tiny_tower
from missm_tpu.core.mesh import make_mesh
from missm_tpu.models.finetune import (
    ModelConfig, init_model_params, model_forward,
)
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.parallel import partition_params, shard_batch
from missm_tpu.train.step import (
    init_train_state, make_eval_step, make_train_step,
)
from missm_tpu.train.trainability import TRAIN, param_labels

B = 8
L = 16
NUM_CLASSES = 3


def tiny_model_cfg(fusion_type="sum"):
    towers = (("image", tiny_tower("image")), ("audio", tiny_tower("audio")))
    fusion = FusionConfig(fusion_type=fusion_type,
                          modality_types=("language", "audio", "image"),
                          output_dims=NUM_CLASSES, feature_dims=24,
                          fusion_dim=8)
    return ModelConfig(towers=towers, fusion=fusion)


def tiny_batch(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    data = {
        "language": jnp.asarray(rng.integers(1, 98, size=(B, L)),
                                dtype=jnp.int32),
        "image": jnp.asarray(
            rng.standard_normal((B, 3, 32, 32)).astype(np.float32)),
        "audio": jnp.asarray(
            rng.standard_normal((B, 3, 32, 48)).astype(np.float32)),
    }
    labels = jnp.asarray(rng.integers(0, NUM_CLASSES, B), dtype=jnp.int32)
    missing = jnp.asarray(
        rng.choice([0, MODALITY_CODES["language"], MODALITY_CODES["audio"],
                    MODALITY_CODES["image"]], B), dtype=jnp.int32)
    return data, labels, missing


def test_train_step_dp():
    cfg = tiny_model_cfg("sum")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh()  # 8 x 1
    params = partition_params(params, mesh)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx)
    data, labels, missing = tiny_batch()
    data = shard_batch(data, mesh)

    losses = []
    for i in range(3):
        state, m = step(state, data, labels, missing, 1e-2,
                        jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # tiny model overfits one batch quickly


def test_train_step_dp_tp():
    cfg = tiny_model_cfg("concat")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    params = partition_params(params, mesh, tp=True)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx)
    data, labels, missing = tiny_batch()
    data = shard_batch(data, mesh)
    state, m = step(state, data, labels, missing, 1e-3, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_tp_matches_dp_numerics():
    """The TP weight sharding must be a pure layout change: one train step
    on a 4x2 dp/tp mesh produces the same loss and (near-)identical params
    as the 8x1 pure-DP mesh."""
    cfg = tiny_model_cfg("sum")
    base = init_model_params(jax.random.PRNGKey(0), cfg)
    data, labels, missing = tiny_batch()

    results = []
    for n_data, n_model, tp in ((8, 1, False), (4, 2, True)):
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        params = partition_params(
            jax.tree_util.tree_map(lambda x: x + 0.0, base), mesh, tp=tp)
        state, tx = init_train_state(params, cfg)
        step = make_train_step(cfg, tx)
        d = shard_batch(data, mesh)
        state, m = step(state, d, labels, missing, 1e-2,
                        jax.random.PRNGKey(0))
        results.append((float(m["loss"]),
                        np.asarray(state.params["fusion"]["proj"]["image"]["w"])))

    (loss_dp, w_dp), (loss_tp, w_tp) = results
    assert loss_dp == pytest.approx(loss_tp, rel=1e-5)
    np.testing.assert_allclose(w_dp, w_tp, atol=1e-5, rtol=1e-4)


def test_fsdp_matches_dp_numerics():
    """FSDP (ZeRO-3 param/moment sharding over the data axis) must be a pure
    layout change: same loss and params as pure DP, with the large leaves —
    and the Adam moments built from them — actually sharded, and STILL
    sharded after the step (the memory saving must survive the update)."""
    from jax.sharding import PartitionSpec as P

    cfg = tiny_model_cfg("sum")
    base = init_model_params(jax.random.PRNGKey(0), cfg)
    data, labels, missing = tiny_batch()

    results = []
    for fsdp in (False, True):
        mesh = make_mesh()  # 8 x 1
        params = partition_params(
            jax.tree_util.tree_map(lambda x: x + 0.0, base), mesh,
            fsdp=fsdp, fsdp_min_size=128)
        state, tx = init_train_state(params, cfg)
        if fsdp:
            # the fc1 kernel [L, 32, 64] shards its 64-axis over 8 devices
            w = state.params["encoder"]["image"]["vision"]["blocks"]["mlp"][
                "fc1"]["w"]
            assert w.sharding.spec == P(None, None, "data"), w.sharding
            shard = w.addressable_shards[0].data
            assert shard.shape == (w.shape[0], w.shape[1], w.shape[2] // 8)
            # Adam moments inherit the leaf sharding (zeros_like)
            mu = [m for m in jax.tree_util.tree_leaves(state.opt_state)
                  if hasattr(m, "sharding") and m.ndim == 3
                  and m.shape == w.shape]
            assert mu and all("data" in str(m.sharding.spec) for m in mu)
        step = make_train_step(cfg, tx)
        d = shard_batch(data, mesh)
        for i in range(2):
            state, m = step(state, d, labels, missing, 1e-2,
                            jax.random.PRNGKey(i))
        if fsdp:
            w = state.params["encoder"]["image"]["vision"]["blocks"]["mlp"][
                "fc1"]["w"]
            assert "data" in str(w.sharding.spec), (
                "FSDP sharding lost through the train step")
        results.append((float(m["loss"]),
                        np.asarray(state.params["fusion"]["proj"]["image"]["w"])))

    (loss_dp, w_dp), (loss_fsdp, w_fsdp) = results
    assert loss_dp == pytest.approx(loss_fsdp, rel=1e-5)
    np.testing.assert_allclose(w_dp, w_fsdp, atol=1e-5, rtol=1e-4)


def test_fsdp_spec_selection():
    """The per-leaf FSDP spec rules: largest divisible axis wins, the
    [L, ...] scan axis of stacked block leaves is never sharded, leaves
    below min_size or with no divisible axis stay replicated, and the
    TP-taken axis is excluded."""
    from jax.sharding import PartitionSpec as P

    from missm_tpu.parallel.partitioning import param_pspecs

    params = {
        "embed": np.zeros((100, 64), np.float32),      # 100 % 8 != 0 -> 64
        "blocks": {"w": np.zeros((8, 32, 16), np.float32)},  # scan axis out
        "tiny": np.zeros((4, 8), np.float32),          # below min_size
        "odd": np.zeros((9, 9), np.float32),           # nothing divisible
    }
    specs = param_pspecs(params, fsdp_size=8, fsdp_min_size=64)
    assert specs["embed"] == P(None, "data")           # 64 divisible, 100 not
    # blocks: axis 0 is the lax.scan layer axis — axis 1 (32) is largest
    # remaining divisible
    assert specs["blocks"]["w"] == P(None, "data", None)
    assert specs["tiny"] == P()
    assert specs["odd"] == P()

    # TP first: fc1 kernel [L, in, out] is column-sharded on 'model';
    # FSDP must take the remaining 'in' axis, not double-shard 'out'
    tp_like = {"blocks": {"mlp": {"fc1": {"w": np.zeros((8, 32, 64),
                                                        np.float32)}}}}
    specs = param_pspecs(tp_like, tp=True, fsdp_size=8, fsdp_min_size=64)
    assert specs["blocks"]["mlp"]["fc1"]["w"] == P(None, "data", "model")


def test_fsdp_composes_with_tp():
    """4x2 mesh, Megatron-TP on the model axis + FSDP on the data axis: the
    TP-sharded axis is excluded, a remaining divisible axis takes the data
    shard, and a train step runs finite.

    Runs in a retried CHILD process (tests/fsdp_tp_worker.py): the
    all-gather + two-axis-psum program is in the multi-collective class
    that XLA:CPU's dataflow-ordered thunk executor can interlock into a
    rendezvous deadlock that CHECK-aborts the whole pytest process
    (CLAUDE.md gotcha; TPU is immune). A real assertion failure in the
    child (exit 1) is NOT retried."""
    import os
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "fsdp_tp_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker sets its own 8-device flags
    last = None
    for _ in range(3):
        try:
            r = subprocess.run([sys.executable, worker], env=env,
                               stdout=subprocess.PIPE,
                               stderr=subprocess.STDOUT, timeout=300)
        except subprocess.TimeoutExpired as e:
            last = "child hung: " + str(e)
            continue
        out = r.stdout.decode()
        if r.returncode == 0:
            assert "FSDP_TP_OK" in out
            return
        if r.returncode == 1:  # real test failure — don't retry
            pytest.fail(out)
        last = f"exit {r.returncode}:\n{out}"  # CHECK-abort etc. — retry
    pytest.fail(f"fsdp_tp_worker failed 3 attempts; last: {last}")


def test_frozen_base_lora_trains():
    """peft semantics: vision block base weights frozen, LoRA + fusion +
    text + embeddings train."""
    cfg = tiny_model_cfg("sum")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx)
    data, labels, missing = tiny_batch()
    before = jax.tree_util.tree_map(np.asarray, state.params)
    state, _ = step(state, data, labels, missing, 1e-2, jax.random.PRNGKey(0))
    after = state.params

    blk_b = before["encoder"]["image"]["vision"]["blocks"]
    blk_a = after["encoder"]["image"]["vision"]["blocks"]
    np.testing.assert_array_equal(blk_b["attn"]["q"]["w"],
                                  np.asarray(blk_a["attn"]["q"]["w"]))
    # with lora_b == 0 at init, grad wrt lora_a is 0 on step 1 (as in peft);
    # lora_b must move immediately.
    assert not np.array_equal(blk_b["attn"]["q"]["lora_b"],
                              np.asarray(blk_a["attn"]["q"]["lora_b"]))
    assert not np.array_equal(before["fusion"]["proj"]["image"]["w"],
                              np.asarray(after["fusion"]["proj"]["image"]["w"]))


def test_partition_combine_roundtrip():
    """partition_trainable/combine_params invariants: combine(partition(p))
    reproduces p leaf-for-leaf, and the label alignment (zip of two
    tree_flatten orders) puts exactly the non-LoRA vision-block leaves on
    the frozen side."""
    from missm_tpu.train.step import combine_params
    from missm_tpu.train.step import partition_trainable as split_trainable

    cfg = tiny_model_cfg("sum")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    treedef, trainable, frozen = split_trainable(params, cfg)
    # exact partition: each slot filled on exactly one side
    assert all((t is None) != (f is None)
               for t, f in zip(trainable, frozen))
    merged = combine_params(treedef, trainable, frozen)
    orig = jax.tree_util.tree_leaves_with_path(params)
    back = jax.tree_util.tree_leaves_with_path(merged)
    assert [p for p, _ in orig] == [p for p, _ in back]
    for (path, a), (_, b) in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))
    # frozen side == vision-block base leaves, trainable side == the rest
    flat_paths = [p for p, _ in orig]
    for path, t in zip(flat_paths, trainable):
        keys = [getattr(k, "key", None) for k in path]
        # only the LoRA-wrapped VISION encoder blocks freeze; text-tower
        # blocks, embeddings, LNs outside blocks, and fusion all train
        in_vision_blocks = "vision" in keys and "blocks" in keys
        is_lora = keys[-1] in ("lora_a", "lora_b")
        expect_frozen = in_vision_blocks and not is_lora
        assert (t is None) == expect_frozen, (keys, t is None)


def test_mtd_teacher_ema_moves_fusion_only():
    cfg = tiny_model_cfg("MTD_stu")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    teacher = jax.tree_util.tree_map(lambda x: x + 0.0, params["fusion"])
    state, tx = init_train_state(params, cfg, teacher_fusion=teacher)
    step = make_train_step(cfg, tx)
    data, labels, missing = tiny_batch()
    t_before = jax.tree_util.tree_map(np.asarray, state.teacher_fusion)
    state, m = step(state, data, labels, missing, 1e-2, jax.random.PRNGKey(0))
    t_after = state.teacher_fusion
    # EMA: teacher moved slightly toward student
    d = np.abs(t_before["head"]["fc1"]["w"]
               - np.asarray(t_after["head"]["fc1"]["w"])).max()
    assert 0 < d < 1e-3
    assert np.isfinite(float(m["loss"]))


@pytest.mark.parametrize("ftype", ["KL_stu", "self_distill", "Distill_tea"])
def test_distill_variants_run(ftype):
    cfg = tiny_model_cfg(ftype)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    # +0.0 forces distinct buffers (same-buffer donation is invalid)
    teacher = (jax.tree_util.tree_map(lambda x: x + 0.0, params["fusion"])
               if ftype == "KL_stu" else None)
    state, tx = init_train_state(params, cfg, teacher_fusion=teacher)
    step = make_train_step(cfg, tx)
    data, labels, missing = tiny_batch()
    state, m = step(state, data, labels, missing, 1e-2, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_eval_step():
    cfg = tiny_model_cfg("sum")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    ev = make_eval_step(cfg)
    data, labels, missing = tiny_batch()
    out = ev(params, data, labels, missing)
    assert out["preds"].shape == (B,)
    assert out["probs"].shape == (B, NUM_CLASSES)
    np.testing.assert_allclose(np.asarray(out["probs"]).sum(1), 1.0,
                               atol=1e-5)


def test_loss_parity_vs_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from missm_tpu.train.losses import (cross_entropy, kl_distill_loss,
                                        masked_kl_distill)

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((5, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 5)
    ref = F.cross_entropy(torch.tensor(logits), torch.tensor(labels)).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(ref, abs=1e-6)

    s = rng.standard_normal((5, 12)).astype(np.float32)
    t = rng.standard_normal((5, 12)).astype(np.float32)
    T = 0.15
    ref_kl = F.kl_div(F.log_softmax(torch.tensor(s) / T, dim=1),
                      F.softmax(torch.tensor(t) / T, dim=1),
                      reduction="batchmean").item()
    got_kl = float(kl_distill_loss(jnp.asarray(s), jnp.asarray(t), T))
    assert got_kl == pytest.approx(ref_kl, rel=1e-5)

    mask = np.array([True, False, True, True, False])
    ref_m = F.kl_div(F.log_softmax(torch.tensor(s[mask]) / T, dim=1),
                     F.softmax(torch.tensor(t[mask]) / T, dim=1),
                     reduction="batchmean").item()
    got_m = float(masked_kl_distill(jnp.asarray(s), jnp.asarray(t),
                                    jnp.asarray(mask), T))
    assert got_m == pytest.approx(ref_m, rel=1e-5)


def test_block_forward_rejects_unknown_policy_string():
    """Raw-string remat callers (bench kwargs, probe scripts) bypass the
    argparse validation; _block_forward must raise on an unknown policy
    instead of silently measuring full-remat performance."""
    import dataclasses

    cfg = dataclasses.replace(tiny_model_cfg("sum"), remat="save_attn_mlp_qvk")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    data, labels, missing = tiny_batch()
    with pytest.raises(ValueError, match="unknown remat policy"):
        jax.jit(lambda p: model_forward(p, cfg, data, missing,
                                        train=True,
                                        rng=jax.random.PRNGKey(0))
                ).lower(params)


def test_per_modality_remat_matches_uniform():
    """Remat is a recompute schedule, not math: a per-modality remat spec
    (models.encoder._remat_for, --remat "video=...,audio=..." in
    compat.args) must produce the same loss and updated params as a
    uniform policy."""
    import dataclasses

    from missm_tpu.compat.args import _remat

    spec = _remat("image=save_attn_mlp,audio=true,language=false")
    assert spec == (("image", "save_attn_mlp"), ("audio", True),
                    ("language", False))
    assert _remat("save_attn") == "save_attn"
    assert _remat("false") is False

    data, labels, missing = tiny_batch()
    results = []
    for remat in (True, spec):
        cfg = dataclasses.replace(tiny_model_cfg("sum"), remat=remat)
        params = init_model_params(jax.random.PRNGKey(0), cfg)
        state, tx = init_train_state(params, cfg)
        step = make_train_step(cfg, tx)
        state, m = step(state, data, labels, missing, 1e-2,
                        jax.random.PRNGKey(0))
        results.append((float(m["loss"]),
                        np.asarray(state.params["fusion"]["proj"]["image"]["w"])))

    (loss_u, w_u), (loss_s, w_s) = results
    assert loss_u == pytest.approx(loss_s, rel=1e-6)
    np.testing.assert_allclose(w_u, w_s, atol=1e-6, rtol=1e-5)


def test_all_remat_policies_same_math():
    """Every named remat policy (including the round-4 additions —
    save_attn_mlp_qkv_sig / _tkern / save_attn_mlp_tqkv) is a recompute
    schedule only: one train step under each must produce the same loss
    and updated params as full remat."""
    import dataclasses

    from missm_tpu.compat.args import _REMAT_POLICIES

    data, labels, missing = tiny_batch()
    ref = None
    for remat in (True,) + _REMAT_POLICIES:
        cfg = dataclasses.replace(tiny_model_cfg("sum"), remat=remat)
        params = init_model_params(jax.random.PRNGKey(0), cfg)
        state, tx = init_train_state(params, cfg)
        step = make_train_step(cfg, tx)
        state, m = step(state, data, labels, missing, 1e-2,
                        jax.random.PRNGKey(0))
        got = (float(m["loss"]),
               np.asarray(state.params["fusion"]["proj"]["image"]["w"]))
        if ref is None:
            ref = got
        else:
            assert got[0] == pytest.approx(ref[0], rel=1e-6), remat
            np.testing.assert_allclose(got[1], ref[1], atol=1e-6,
                                       rtol=1e-5, err_msg=str(remat))


@pytest.mark.parametrize("A", [2, 4])
def test_grad_accum_matches_manual_microbatching(A):
    """accum_steps=A must equal manually averaging the A microbatch
    gradients (same per-microbatch rng split) and applying one Adam
    update — the scan accumulates, it does not change the math. A=4 is
    the shipped bench_train default (the 4x16 schedule), so the actual
    bench config is covered, not extrapolated from A=2.

    (The manual reference runs FIRST: the jitted step donates the state
    buffers, after which the shared param arrays are deleted.)"""
    import optax

    from missm_tpu.train.step import (combine_params, compute_loss,
                                      partition_trainable)

    cfg = tiny_model_cfg("sum")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    data, labels, missing = tiny_batch()
    rng = jax.random.PRNGKey(7)

    # manual reference: A microbatch grads, averaged, one Adam update
    treedef, trainable, frozen = partition_trainable(params, cfg)

    def loss_fn(tr, d, lb, mi, r):
        return compute_loss(combine_params(treedef, tr, frozen), None, cfg,
                            d, lb, mi, r)[0]

    h = B // A
    rngs = jax.random.split(rng, A)
    grads, losses = None, []
    for i in range(A):
        sl = slice(i * h, (i + 1) * h)
        d = {k: v[sl] for k, v in data.items()}
        g = jax.grad(loss_fn)(trainable, d, labels[sl], missing[sl], rngs[i])
        losses.append(float(loss_fn(trainable, d, labels[sl], missing[sl],
                                    rngs[i])))
        grads = g if grads is None else jax.tree_util.tree_map(
            jnp.add, grads, g)
    grads = jax.tree_util.tree_map(lambda x: x / A, grads)

    state0, tx0 = init_train_state(params, cfg)
    updates, _ = tx0.update(grads, state0.opt_state, trainable)
    updates = jax.tree_util.tree_map(lambda u: -1e-2 * u, updates)
    expect = jax.tree_util.tree_map(
        jnp.copy, combine_params(treedef,
                                 optax.apply_updates(trainable, updates),
                                 frozen))

    # accumulated step (donates state0's buffers)
    step = make_train_step(cfg, tx0, accum_steps=A)
    state_a, m = step(state0, data, labels, missing, 1e-2, rng)

    assert float(m["loss"]) == pytest.approx(np.mean(losses), rel=1e-6)
    got = state_a.params["encoder"]["image"]["vision"]["blocks"]["attn"]
    want = expect["encoder"]["image"]["vision"]["blocks"]["attn"]
    for k in ("q", "out"):
        np.testing.assert_allclose(np.asarray(got[k]["w"]),
                                   np.asarray(want[k]["w"]),
                                   atol=1e-6, rtol=1e-5)

    # batch not divisible by accum_steps fails loudly at trace time
    params2 = init_model_params(jax.random.PRNGKey(0), cfg)
    state2, tx2 = init_train_state(params2, cfg)
    with pytest.raises(AssertionError):
        make_train_step(cfg, tx2, accum_steps=3)(state2, data, labels,
                                                 missing, 1e-2, rng)


def test_grad_accum_with_valid_mask_weights_microbatches():
    """accum + padded batch: microbatch means must recombine with
    valid-row-count weights (4 real rows in micro 1, 1 in micro 2 —
    equal 1/A weights would give micro 2's single row 4x the gradient
    weight of micro 1's rows). Ground truth: the manually weighted
    combination of the two microbatch grads with the same split rngs."""
    import optax

    from missm_tpu.train.step import (combine_params, compute_loss,
                                      partition_trainable)

    cfg = tiny_model_cfg("sum")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    data, labels, missing = tiny_batch()
    n_real = 5
    valid = jnp.arange(B) < n_real          # micro counts [4, 1]
    rng = jax.random.PRNGKey(9)

    treedef, trainable, frozen = partition_trainable(params, cfg)

    def loss_fn(tr, d, lb, mi, r, v):
        return compute_loss(combine_params(treedef, tr, frozen), None, cfg,
                            d, lb, mi, r, valid=v)[0]

    h = B // 2
    rngs = jax.random.split(rng, 2)
    g_sum, l_sum, w_sum = None, 0.0, 0.0
    for i in range(2):
        sl = slice(i * h, (i + 1) * h)
        d = {k: v[sl] for k, v in data.items()}
        a = (d, labels[sl], missing[sl], rngs[i], valid[sl])
        w = float(valid[sl].sum())
        g = jax.grad(loss_fn)(trainable, *a)
        l_sum += w * float(loss_fn(trainable, *a))
        g_sum = (jax.tree_util.tree_map(lambda x: w * x, g) if g_sum is None
                 else jax.tree_util.tree_map(lambda acc, x: acc + w * x,
                                             g_sum, g))
        w_sum += w
    grads = jax.tree_util.tree_map(lambda x: x / w_sum, g_sum)

    state0, tx0 = init_train_state(params, cfg)
    updates, _ = tx0.update(grads, state0.opt_state, trainable)
    updates = jax.tree_util.tree_map(lambda u: -1e-2 * u, updates)
    expect = jax.tree_util.tree_map(
        jnp.copy, combine_params(treedef,
                                 optax.apply_updates(trainable, updates),
                                 frozen))

    step = make_train_step(cfg, tx0, accum_steps=2)
    state_a, m = step(state0, data, labels, missing, 1e-2, rng, valid=valid)

    assert float(m["loss"]) == pytest.approx(l_sum / w_sum, rel=1e-6)
    got = state_a.params["encoder"]["image"]["vision"]["blocks"]["attn"]
    want = expect["encoder"]["image"]["vision"]["blocks"]["attn"]
    for k in ("q", "out"):
        np.testing.assert_allclose(np.asarray(got[k]["w"]),
                                   np.asarray(want[k]["w"]),
                                   atol=1e-6, rtol=1e-5)


def test_remat_unknown_modality_key_fails_loudly():
    """--remat with a typo'd MODALITY key must be a parse error — the
    key would otherwise silently fall through to the default policy."""
    from missm_tpu.compat.args import train_args

    base = ["--datasetName", "mvsa", "--csv_path", "x.csv",
            "--modality_types", "language", "image"]
    with pytest.raises(SystemExit):
        train_args(base + ["--remat", "adio=save_attn_mlp"])  # typo
    args = train_args(base + ["--remat",
                              "image=save_attn_mlp,default=true"])
    assert dict(args.remat) == {"image": "save_attn_mlp", "default": True}


def test_remat_spec_validation_and_partial_default():
    """A typo'd remat policy must be a loud parse error (silently-off
    remat OOMs ViT-L workloads), and towers a partial per-modality spec
    does not name inherit full remat (True), the CLI default."""
    import argparse

    from missm_tpu.compat.args import _remat
    from missm_tpu.models.encoder import _remat_for

    with pytest.raises(argparse.ArgumentTypeError):
        _remat("save_atn_mlp")  # typo, no '='
    with pytest.raises(argparse.ArgumentTypeError):
        _remat("video=save_atn_mlp,audio=save_attn_mlp_kern")
    # whitespace-padded values parse (only keys were stripped before)
    spec = _remat("video=save_attn_mlp , audio=true")
    assert dict(spec) == {"video": "save_attn_mlp", "audio": True}
    assert _remat_for(spec, "language") is True
    assert _remat_for(_remat("video=save_attn_mlp,default=false"),
                      "language") is False


def test_grad_accum_arg_validation():
    from missm_tpu.compat.args import train_args

    base = ["--datasetName", "mvsa", "--csv_path", "x.csv",
            "--batch_size", "6"]
    with pytest.raises(SystemExit):
        train_args(base + ["--grad_accum", "0"])
    with pytest.raises(SystemExit):
        train_args(base + ["--grad_accum", "4"])  # 6 % 4
    assert train_args(base + ["--grad_accum", "3"]).grad_accum == 3


def test_train_step_valid_mask_matches_unpadded_short_batch():
    """A padded batch with `valid` masking the repeats must produce the
    SAME loss and updated params as training on the short batch alone —
    the reference trains the final partial batch unpadded; an unmasked
    mean would hand the repeated row most of the gradient."""
    cfg = tiny_model_cfg("sum")
    data, labels, missing = tiny_batch()
    n_real = B - 3
    short = ({k: v[:n_real] for k, v in data.items()},
             labels[:n_real], missing[:n_real])
    # pad by repeating the last real row (what _pad_batch does)
    pad = lambda x: jnp.concatenate(
        [x[:n_real]] + [x[n_real - 1:n_real]] * (B - n_real), axis=0)
    padded = ({k: pad(v) for k, v in data.items()},
              pad(labels), pad(missing))
    valid = jnp.arange(B) < n_real
    rng = jax.random.PRNGKey(5)

    results = []
    for args in [(short, None), (padded, valid)]:
        (d, lb, mi), v = args
        params = init_model_params(jax.random.PRNGKey(0), cfg)
        state, tx = init_train_state(params, cfg)
        step = make_train_step(cfg, tx)
        state, m = step(state, d, lb, mi, 1e-2, rng, valid=v)
        w = state.params["encoder"]["image"]["vision"]["blocks"]["attn"]
        results.append((float(m["loss"]),
                        np.asarray(w["q"]["w"]).copy()))
    (loss_s, w_s), (loss_p, w_p) = results
    assert loss_s == pytest.approx(loss_p, rel=1e-6)
    np.testing.assert_allclose(w_s, w_p, atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("ftype", [
    "concat", "regression", "intra_attention", "inter_attention",
    "graph_fusion", "unified_graph", "dedicated_dnn",
    "Distill_tea", "MTD_stu", "KL_stu", "self_distill"])
def test_all_fusion_heads_train_and_eval_jitted(ftype):
    """EVERY fusion head must run through the PRODUCTION jitted train and
    eval steps — not just an eager forward. (inter_attention and the two
    graph heads used to carry a Python-int leaf in their params pytree:
    jax.grad rejected the int32 input and jit turned reshape dims into
    tracers, so they could neither train nor eval through the CLI paths
    while the eager-only tests stayed green.)"""
    from missm_tpu.train.step import make_eval_step

    cfg = tiny_model_cfg(ftype)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    # teacher must be distinct buffers (the CLI restores it from a
    # checkpoint) — aliasing the student's arrays inside the donated
    # state is a double-donation error
    teacher = (jax.tree_util.tree_map(jnp.copy, params["fusion"])
               if ftype in ("MTD_stu", "KL_stu") else None)
    state, tx = init_train_state(params, cfg, teacher_fusion=teacher)
    data, labels, missing = tiny_batch()
    step = make_train_step(cfg, tx)
    state, m = step(state, data, labels, missing, 1e-3, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    out = make_eval_step(cfg)(state.params, data, labels, missing)
    assert np.isfinite(float(out["loss"]))
    assert out["preds"].shape == (B,)
