"""Activation-parity check for REAL LanguageBind checkpoints.

The committed conversion pin (tests/test_checkpoint_fixture.py) runs the
reference's own tower code at a small config with synthetic weights —
the strongest evidence available offline. The first time the actual
`LanguageBind/<name>` HF checkpoints are downloadable, this script is
the one-command upgrade of that pin to the real thing (VERDICT r3
missing #1, docs/MIGRATION.md "First network access"):

  huggingface-cli download LanguageBind/LanguageBind_Image \
      --local-dir cache_dir/LanguageBind_Image   # (+ Video/Audio/...)
  python scripts/real_ckpt_parity.py --checkpoint_dir cache_dir

For every LanguageBind_<M> directory found it (1) instantiates the
reference tower module from its read-only mount with the checkpoint's
own config.json, loads the real weights, and runs a fixed input batch;
(2) converts the same state dict through the production path
(compat.convert.convert_tower_state_dict) and runs missm_tpu's tower;
(3) compares vision/text pooled features elementwise. Passes when every
tower matches to --atol (default 2e-4 f32 — transformer-depth float
noise; the tiny-config fixture matches to ~1e-5).

Offline smoke test (exercises this script's own plumbing end-to-end):
  python scripts/real_ckpt_parity.py \
      --checkpoint_dir tests/fixtures/lb_ckpt --fixture_config
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

MODALITIES = ("image", "video", "audio", "depth", "thermal")


class _AnySize:
    """Bypass newer-HF strict input-size equality (the audio tower's
    rect grid is a LIST after resize_pos, modeling_audio.py:798, and the
    reference's older transformers didn't compare)."""

    def __ne__(self, other):
        return False

    def __eq__(self, other):
        return True


def tower_cfg_for(m, ckpt_dir, fixture):
    import dataclasses

    from missm_tpu.core.config import languagebind_large, tiny_tower

    if fixture:
        return tiny_tower(m)
    cfg_json = os.path.join(ckpt_dir, "config.json")
    t = languagebind_large(m)
    if os.path.exists(cfg_json):
        with open(cfg_json) as f:
            raw = json.load(f).get("vision_config_dict") or {}
        # honor the checkpoint's own geometry where it differs
        keep = {k: raw[k] for k in ("patch_size", "num_frames")
                if k in raw}
        if "image_size" in raw:
            s = raw["image_size"]
            keep["image_size"] = (tuple(s) if isinstance(s, (list, tuple))
                                  else (s, s))
        if keep:
            t = dataclasses.replace(
                t, vision=dataclasses.replace(t.vision, **keep))
    return t


def ref_model(m, sd, tcfg):
    import torch

    from tests.ref_shim import load_reference_tower

    mod = load_reference_tower(m)
    conf = sys.modules[f"ref_languagebind_{m}.configuration_{m}"]
    cfg_cls = getattr(conf, f"LanguageBind{m.capitalize()}Config")
    v, t = tcfg.vision, tcfg.text
    # the reference constructs embeddings at a SQUARE int size; the audio
    # rect grid comes from resize_pos at init (modeling_audio.py:798-804)
    vkw = dict(hidden_size=v.hidden_size,
               intermediate_size=v.intermediate_size,
               num_hidden_layers=v.num_layers,
               num_attention_heads=v.num_heads,
               image_size=int(v.image_size[0]),
               patch_size=v.patch_size, projection_dim=tcfg.projection_dim,
               lora_r=0, add_time_attn=v.add_time_attn)
    if v.add_time_attn:
        vkw["num_frames"] = v.num_frames
    if m == "audio":
        vkw.update(num_mel_bins=tcfg.num_mel_bins,
                   target_length=tcfg.target_length)
    cfg = cfg_cls(
        text_config_dict=dict(
            vocab_size=t.vocab_size, hidden_size=t.hidden_size,
            intermediate_size=t.intermediate_size,
            num_hidden_layers=t.num_layers,
            num_attention_heads=t.num_heads,
            max_position_embeddings=t.max_position_embeddings,
            projection_dim=tcfg.projection_dim),
        vision_config_dict=vkw, projection_dim=tcfg.projection_dim)
    for c in (cfg, cfg.text_config, cfg.vision_config):
        c._attn_implementation = "eager"
    name = f"LanguageBind{m.capitalize()}"
    torch.manual_seed(0)
    model = getattr(mod, name)(cfg).eval()
    missing, unexpected = model.load_state_dict(sd, strict=False)
    real_missing = [k for k in missing if "position_ids" not in k]
    if real_missing or unexpected:
        raise SystemExit(f"{m}: state dict mismatch vs reference module — "
                         f"missing {real_missing[:5]} "
                         f"unexpected {list(unexpected)[:5]}")
    model.vision_model.embeddings.image_size = _AnySize()
    return model


def run_one(m, ckpt_dir, fixture, atol, rng):
    import torch

    from missm_tpu.cli.common import _load_torch_state_dict
    from missm_tpu.compat.convert import convert_tower_state_dict
    from missm_tpu.models.tower import text_features, vision_features

    sd_np = _load_torch_state_dict(ckpt_dir)
    sd = {k: torch.as_tensor(np.asarray(v)) for k, v in sd_np.items()}
    tcfg = tower_cfg_for(m, ckpt_dir, fixture)
    model = ref_model(m, sd, tcfg)

    v = tcfg.vision
    h, w = v.image_size
    if v.add_time_attn:
        px = rng.standard_normal(
            (2, 3, v.num_frames, h, w)).astype(np.float32)
    else:
        px = rng.standard_normal((2, 3, h, w)).astype(np.float32)
    ids = np.full((2, tcfg.text.max_position_embeddings), 3, np.int64)
    ids[:, 0] = tcfg.text.vocab_size - 2 if fixture else 49406
    ids[:, -1] = tcfg.text.vocab_size - 1 if fixture else 49407

    with torch.no_grad():
        ref_v = model.get_image_features(pixel_values=torch.as_tensor(px))
        ref_t = model.get_text_features(input_ids=torch.as_tensor(ids))

    params = convert_tower_state_dict(sd_np, tcfg)
    ours_v = vision_features(params["vision"], v, px,
                             projection=params["visual_projection"])
    ours_t = text_features(params["text"], tcfg.text, ids.astype(np.int32),
                           projection=params["text_projection"])[1]

    dv = float(np.max(np.abs(np.asarray(ours_v) - ref_v.numpy())))
    dt = float(np.max(np.abs(np.asarray(ours_t) - ref_t.numpy())))
    ok = dv <= atol and dt <= atol
    print(f"{m:8s} vision |Δ|max={dv:.2e}  text |Δ|max={dt:.2e}  "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", default="./cache_dir")
    ap.add_argument("--fixture_config", action="store_true",
                    help="checkpoint dirs hold the tiny committed fixture "
                         "(offline smoke test of this script)")
    ap.add_argument("--atol", type=float, default=2e-4)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    ran, ok = 0, True
    for m in MODALITIES:
        d = os.path.join(args.checkpoint_dir,
                         f"LanguageBind_{m.capitalize()}")
        if not os.path.isdir(d):
            continue
        ran += 1
        ok = run_one(m, d, args.fixture_config, args.atol, rng) and ok
    if not ran:
        raise SystemExit(f"no LanguageBind_<M> directories under "
                         f"{args.checkpoint_dir}")
    print("ALL OK" if ok else "PARITY FAILURE")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
