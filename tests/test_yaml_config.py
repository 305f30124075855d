"""YAML config layer: sectioned schema, renames, CLI precedence, typo
rejection."""
import pytest

from missm_tpu.compat.args import train_args


def test_yaml_applies_and_cli_wins(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "dataset:\n  name: AVE\n  csv_path: /d/ave/label.csv\n"
        "training:\n  epochs: 7\n  learning_rate: 0.005\n"
        "model:\n  fusion_type: concat\n  fusion_dim: 128\n")
    args = train_args(["--config", str(cfg), "--learning_rate", "0.001"])
    assert args.datasetName == "AVE"
    assert args.csv_path == "/d/ave/label.csv"
    assert args.num_epochs == 7
    assert args.fusion_type == "concat"
    assert args.fusion_dim == 128
    assert args.learning_rate == 0.001  # CLI beats YAML


def test_yaml_unknown_key_raises(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("model:\n  fusion_typo: sum\n")
    with pytest.raises(KeyError, match="fusion_typo"):
        train_args(["--config", str(cfg)])


def test_yaml_values_route_through_flag_parsers(tmp_path):
    """YAML strings must pass through the same type= callables the CLI
    flag uses: a remat spec becomes the parsed tuple (validated), not a
    raw string silently reaching the model layer; typo'd policies and
    unknown modality keys fail just like on the CLI."""
    import argparse

    good = tmp_path / "good.yaml"
    good.write_text("remat: video=save_attn_mlp,default=true\n"
                    "dataset:\n  name: AVE\n  csv_path: /d/l.csv\n"
                    "  modality_types: [language, video, audio]\n")
    args = train_args(["--config", str(good)])
    assert dict(args.remat) == {"video": "save_attn_mlp", "default": True}

    bad = tmp_path / "bad.yaml"
    bad.write_text("remat: video=save_atn_mlp\n"   # typo'd policy value
                   "dataset:\n  name: AVE\n  csv_path: /d/l.csv\n")
    with pytest.raises(argparse.ArgumentTypeError):
        train_args(["--config", str(bad)])

    badkey = tmp_path / "badkey.yaml"
    badkey.write_text("remat: adio=save_attn_mlp\n"  # typo'd modality key
                      "dataset:\n  name: AVE\n  csv_path: /d/l.csv\n"
                      "  modality_types: [language, audio]\n")
    with pytest.raises(SystemExit):
        train_args(["--config", str(badkey)])
