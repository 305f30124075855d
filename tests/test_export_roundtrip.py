"""Export (pytree -> HF state dict) roundtrips through the converter."""
import numpy as np
import pytest

import jax

from missm_tpu.core.config import tiny_tower
from missm_tpu.compat.convert import convert_tower_state_dict
from missm_tpu.compat.export import export_tower_state_dict
from missm_tpu.models.tower import init_tower_params


@pytest.mark.parametrize("modality", ["image", "video"])
def test_roundtrip(modality):
    cfg = tiny_tower(modality)  # image has LoRA r=2, video temporal+LoRA
    params = init_tower_params(jax.random.PRNGKey(0), cfg)
    sd = export_tower_state_dict(params, cfg)
    back = convert_tower_state_dict(sd, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {tuple(str(k) for k in p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        key = tuple(str(k) for k in path)
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_b[key]), atol=0,
                                   err_msg=str(key))


def test_export_loads_into_hf_clip():
    """An exported image tower must load into transformers CLIPModel."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig, CLIPModel

    cfg = tiny_tower("image", lora_r=0)
    params = init_tower_params(jax.random.PRNGKey(1), cfg)
    sd = export_tower_state_dict(params, cfg)

    hf_cfg = CLIPConfig(
        text_config={"vocab_size": 99, "hidden_size": 32,
                     "intermediate_size": 64, "num_hidden_layers": 2,
                     "num_attention_heads": 2,
                     "max_position_embeddings": 16,
                     "hidden_act": "quick_gelu"},
        vision_config={"hidden_size": 32, "intermediate_size": 64,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "image_size": 32, "patch_size": 16,
                       "hidden_act": "quick_gelu"},
        projection_dim=24)
    model = CLIPModel(hf_cfg)
    missing, unexpected = model.load_state_dict(
        {k: torch.tensor(v.copy()) for k, v in sd.items()}, strict=False)
    # position_ids buffers may be missing; no unexpected keys allowed
    assert not unexpected, unexpected
    assert all("position_ids" in k or "logit_scale" in k for k in missing), \
        missing
