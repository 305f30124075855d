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
