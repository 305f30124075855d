"""`--init checkpoint` path: load a LanguageBind-layout torch checkpoint
directory, convert, inject LoRA, and build the full model."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.cli.common import build_model_config, init_params
from missm_tpu.models.finetune import model_forward
from tests.synthetic import Args
from tests.test_convert_video import _mk_video_state_dict


def _mk_image_state_dict(rng, cfg):
    """Image-tower layout = video layout without temporal modules."""
    sd = _mk_video_state_dict(rng, cfg)
    return {k: v for k, v in sd.items() if "temporal" not in k}


def test_init_from_checkpoint_dir(tmp_path):
    torch = pytest.importorskip("torch")
    from missm_tpu.core.config import tiny_tower

    args = Args(model_scale="tiny", init="checkpoint",
                checkpoint_dir=str(tmp_path), fusion_type="sum",
                modality_types=["language", "image"], remat=False,
                bf16=False)
    cfg = build_model_config(args, num_classes=3)

    tcfg = tiny_tower("image")
    sd = _mk_image_state_dict(np.random.default_rng(0), tcfg)
    ckpt_dir = tmp_path / "LanguageBind_Image"
    ckpt_dir.mkdir()
    torch.save({k: torch.tensor(v) for k, v in sd.items()},
               ckpt_dir / "pytorch_model.bin")

    params = init_params(args, cfg, jax.random.PRNGKey(0))
    # converted weights present + LoRA injected post-load
    blk = params["encoder"]["image"]["vision"]["blocks"]
    assert "lora_a" in blk["attn"]["q"]
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["image"]["vision"]["post_ln"]["scale"]),
        np.ones(32))

    rng = np.random.default_rng(1)
    data = {
        "language": jnp.asarray(rng.integers(1, 98, (2, 16)), jnp.int32),
        "image": jnp.asarray(rng.standard_normal((2, 3, 32, 32)),
                             jnp.float32),
    }
    logits, _ = model_forward(params, cfg, data, jnp.zeros((2,), jnp.int32))
    assert logits.shape == (2, 3)
    assert np.isfinite(np.asarray(logits)).all()
