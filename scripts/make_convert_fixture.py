"""Generate the committed checkpoint-conversion fixture (VERDICT r1
missing #1): serialize reference LanguageBind tower state_dicts in the HF
cache layout the CLI consumes (`checkpoint_dir/LanguageBind_<M>/
pytorch_model.bin`) plus an input batch and the reference towers' own
output activations. `tests/test_checkpoint_fixture.py` then converts the
full multi-tower checkpoint through the production load path
(cli.common.init_params -> compat.convert) and matches the activations
end-to-end.

Towers exercised: ALL FIVE the reference loads
(/root/reference/languagebind/__init__.py:62-68) — image (plain), video
(temporal attention), audio (rectangular mel grid -> resize_pos at
conversion), depth (carries the max_depth=10 config extra,
configuration_depth.py:205), thermal. Real LanguageBind weights are not
downloadable in this environment; the fixture towers are the reference's
OWN modules at a small config with fixed seeds — the same code path that
loads the published checkpoints. The five-tower set also pins the
last-loaded-language aliasing (:69-70) across the full ordering.

Rerun: python scripts/make_convert_fixture.py  (writes tests/fixtures/lb_ckpt)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from tests.ref_shim import load_reference_tower

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "lb_ckpt")

TEXT = dict(vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16, projection_dim=24)
VISION = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
              num_attention_heads=2, image_size=32, patch_size=16,
              projection_dim=24, lora_r=0)


class _AnySize:
    """Disable newer-HF strict square-size check (reference's older env
    didn't have it)."""

    def __ne__(self, other):
        return False

    def __eq__(self, other):
        return True


def build(which: str, seed: int, **vkw):
    mod = load_reference_tower(which)
    conf = sys.modules[f"ref_languagebind_{which}.configuration_{which}"]
    cfg_cls = getattr(conf, f"LanguageBind{which.capitalize()}Config")
    cfg = cfg_cls(text_config_dict=dict(TEXT),
                  vision_config_dict=dict(VISION, **vkw),
                  projection_dim=24)
    for c in (cfg, cfg.text_config, cfg.vision_config):
        c._attn_implementation = "eager"
    torch.manual_seed(seed)
    model = getattr(mod, f"LanguageBind{which.capitalize()}")(cfg).eval()
    model.vision_model.embeddings.image_size = _AnySize()
    return model


def main():
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 98, size=(3, 16)).astype(np.int64)
    ids[:, -1] = 98
    image = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    video = rng.standard_normal((2, 3, 4, 32, 32)).astype(np.float32)
    audio = rng.standard_normal((2, 3, 32, 48)).astype(np.float32)
    depth = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    thermal = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)

    expected = {"ids": ids, "image": image, "video": video, "audio": audio,
                "depth": depth, "thermal": thermal}

    specs = {
        "image": ("LanguageBind_Image", 10, {}, image),
        "video": ("LanguageBind_Video", 11,
                  dict(add_time_attn=True, num_frames=4), video),
        "audio": ("LanguageBind_Audio", 12,
                  dict(add_time_attn=False, num_mel_bins=32,
                       target_length=48), audio),
        "depth": ("LanguageBind_Depth", 13, dict(max_depth=10), depth),
        "thermal": ("LanguageBind_Thermal", 14, {}, thermal),
    }
    for which, (dirname, seed, vkw, px) in specs.items():
        model = build(which, seed, **vkw)
        d = os.path.join(OUT, dirname)
        os.makedirs(d, exist_ok=True)
        torch.save(model.state_dict(), os.path.join(d, "pytorch_model.bin"))
        with torch.no_grad():
            expected[f"{which}_features"] = model.get_image_features(
                pixel_values=torch.tensor(px)).numpy()
            expected[f"{which}_text_features"] = model.get_text_features(
                input_ids=torch.tensor(ids)).numpy()
    np.savez(os.path.join(OUT, "expected.npz"), **expected)
    print(f"fixture written to {OUT}")
    for root, _, files in os.walk(OUT):
        for f in files:
            p = os.path.join(root, f)
            print(f"  {os.path.relpath(p, OUT)}  {os.path.getsize(p)} B")


if __name__ == "__main__":
    main()
