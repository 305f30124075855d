"""--frozen_bf16: storing the frozen (non-LoRA vision-block) partition in
bf16 must be a pure storage change under bf16 compute — model_forward casts
the encoder tree to the compute dtype inside jit regardless
(models.finetune._cast_tree), so the f32 master copy is never read."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.core.config import MODALITY_CODES, tiny_tower
from missm_tpu.models.finetune import ModelConfig, init_model_params
from missm_tpu.models.fusion import FusionConfig
from missm_tpu.train.step import init_train_state, make_train_step
from missm_tpu.train.trainability import (FROZEN, cast_frozen_params,
                                          param_labels)

B = 8


def tiny_batch(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    data = {
        "language": jnp.asarray(rng.integers(1, 98, size=(B, 16)),
                                dtype=jnp.int32),
        "image": jnp.asarray(
            rng.standard_normal((B, 3, 32, 32)).astype(np.float32)),
        "audio": jnp.asarray(
            rng.standard_normal((B, 3, 32, 48)).astype(np.float32)),
    }
    labels = jnp.asarray(rng.integers(0, 3, B), dtype=jnp.int32)
    missing = jnp.asarray(
        rng.choice([0, MODALITY_CODES["language"], MODALITY_CODES["audio"],
                    MODALITY_CODES["image"]], B), dtype=jnp.int32)
    return data, labels, missing


def _cfg():
    towers = (("image", tiny_tower("image")), ("audio", tiny_tower("audio")))
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "audio", "image"),
                          output_dims=3, feature_dims=24, fusion_dim=8)
    return ModelConfig(towers=towers, fusion=fusion,
                       compute_dtype="bfloat16")


def test_cast_frozen_hits_only_frozen_leaves():
    cfg = _cfg()
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    cast = cast_frozen_params(params, cfg)
    labels = param_labels(params, cfg)
    n_cast = 0
    for (path, leaf), (_, label) in zip(
            jax.tree_util.tree_leaves_with_path(cast),
            jax.tree_util.tree_leaves_with_path(labels)):
        if label == FROZEN:
            assert leaf.dtype == jnp.bfloat16, path
            n_cast += 1
        elif jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, path
    assert n_cast > 0  # lora_r=2 towers do have a frozen partition
    # LoRA adapters inside the frozen blocks stay trainable-f32
    blk = cast["encoder"]["image"]["vision"]["blocks"]["attn"]["q"]
    assert blk["lora_a"].dtype == jnp.float32
    assert blk["w"].dtype == jnp.bfloat16


def test_frozen_bf16_train_step_parity():
    """One train step from bf16-stored frozen params matches the f32-stored
    run bitwise: same loss, same updated trainable leaves, frozen leaves
    unchanged (bf16(f32 leaf) == stored-bf16 leaf)."""
    cfg = _cfg()
    base = init_model_params(jax.random.PRNGKey(0), cfg)
    data, labels, missing = tiny_batch()

    results = []
    for frozen_bf16 in (False, True):
        params = jax.tree_util.tree_map(lambda x: x + 0.0, base)
        if frozen_bf16:
            params = cast_frozen_params(params, cfg)
        state, tx = init_train_state(params, cfg)
        step = make_train_step(cfg, tx)
        state, m = step(state, data, labels, missing, 1e-2,
                        jax.random.PRNGKey(0))
        results.append((float(m["loss"]), state.params))

    (loss_f32, p_f32), (loss_bf16, p_bf16) = results
    assert loss_f32 == loss_bf16
    # trainable leaves update identically, bit for bit
    for name, leaf32, leaf16 in (
        ("fusion head",
         p_f32["fusion"]["proj"]["image"]["w"],
         p_bf16["fusion"]["proj"]["image"]["w"]),
        ("lora_a",
         p_f32["encoder"]["image"]["vision"]["blocks"]["attn"]["q"]["lora_a"],
         p_bf16["encoder"]["image"]["vision"]["blocks"]["attn"]["q"]["lora_a"]),
        ("lora_b",
         p_f32["encoder"]["audio"]["vision"]["blocks"]["attn"]["v"]["lora_b"],
         p_bf16["encoder"]["audio"]["vision"]["blocks"]["attn"]["v"]["lora_b"]),
    ):
        assert leaf16.dtype == jnp.float32, name
        np.testing.assert_array_equal(np.asarray(leaf32), np.asarray(leaf16),
                                      err_msg=name)
    # frozen leaves: still bf16, value == bf16 round of the f32 run's
    w32 = p_f32["encoder"]["image"]["vision"]["blocks"]["mlp"]["fc1"]["w"]
    w16 = p_bf16["encoder"]["image"]["vision"]["blocks"]["mlp"]["fc1"]["w"]
    assert w16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(w32.astype(jnp.bfloat16)),
                                  np.asarray(w16))


def test_embed_only_frozen_bf16_parity():
    """The test-CLI statistics pass (embed_only) must ALSO be bit-identical
    under --frozen_bf16: it runs the encoder at compute_dtype exactly like
    model_forward, so the stored-bf16 frozen leaves read the same values
    the f32 masters would have cast to. (Regression: embed_only used to
    read params at stored dtype, silently changing concat_mean/median
    imputation statistics for frozen-bf16-trained models.)"""
    from missm_tpu.models.finetune import embed_only

    cfg = _cfg()
    base = init_model_params(jax.random.PRNGKey(0), cfg)
    data, _, _ = tiny_batch()

    outs = []
    for frozen_bf16 in (False, True):
        params = jax.tree_util.tree_map(lambda x: x + 0.0, base)
        if frozen_bf16:
            params = cast_frozen_params(params, cfg)
        outs.append(jax.jit(lambda p, d: embed_only(p, cfg, d))(params, data))
    for m in outs[0]:
        assert outs[0][m].dtype == jnp.float32  # statistics buffers are f32
        np.testing.assert_array_equal(np.asarray(outs[0][m]),
                                      np.asarray(outs[1][m]), err_msg=m)


def test_cast_frozen_requires_bf16_compute():
    towers = (("image", tiny_tower("image")),)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=3, feature_dims=24, fusion_dim=8)
    cfg = ModelConfig(towers=towers, fusion=fusion)  # f32 compute
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="compute_dtype"):
        cast_frozen_params(params, cfg)
