"""Hermetic serving artifacts (eval/artifact.py): jax.export round-trip
parity with the live Predictor, manifest contract, and the export →
predict-from-artifact CLI path."""
import json
import os

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from missm_tpu.core.config import tiny_tower
from missm_tpu.data.tokenizer import HashTokenizer
from missm_tpu.eval.artifact import export_artifact, load_artifact
from missm_tpu.eval.predictor import Predictor
from missm_tpu.models.finetune import ModelConfig, init_model_params
from missm_tpu.models.fusion import FusionConfig
from tests.synthetic import make_mvsa_tree, synthetic_image_loader


def _setup():
    towers = (("image", tiny_tower("image")),)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=3, feature_dims=24, fusion_dim=8)
    cfg = ModelConfig(towers=towers, fusion=fusion)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batch(n, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return {
        "language": jnp.asarray(rng.integers(1, 98, (n, 16)), jnp.int32),
        "image": jnp.asarray(rng.standard_normal((n, 3, 32, 32)),
                             jnp.float32),
    }


def test_artifact_roundtrip_matches_predictor(tmp_path):
    cfg, params = _setup()
    out = str(tmp_path / "artifact")
    export_artifact(params, cfg, _batch(8), out)

    assert os.path.exists(os.path.join(out, "model.stablehlo"))
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["batch_size"] == 8
    assert manifest["num_classes"] == 3
    assert manifest["modality_types"] == ["language", "image"]
    assert manifest["inputs"]["image"]["shape"] == [8, 3, 32, 32]

    art = load_artifact(out)
    pred = Predictor(params, cfg, batch_size=8)

    data = _batch(8, rng_seed=1)
    missing = np.array([0, 1, 4, 0, 1, 4, 0, 0], np.int32)
    p_art, pr_art = art.predict_arrays(data, missing)
    p_live, pr_live = pred.predict_arrays(data, missing)
    np.testing.assert_array_equal(p_art, p_live)
    np.testing.assert_array_equal(pr_art, pr_live)


def test_artifact_partial_batch_and_default_missing(tmp_path):
    cfg, params = _setup()
    out = str(tmp_path / "artifact")
    export_artifact(params, cfg, _batch(8), out)
    art = load_artifact(out)

    preds, probs = art.predict_arrays(_batch(5, rng_seed=2))
    assert preds.shape == (5,)
    assert probs.shape == (5, 3)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)

    with pytest.raises(ValueError, match="exported at batch_size"):
        art.predict_arrays(_batch(9))


def test_export_cli_then_predict_from_artifact(tmp_path, monkeypatch):
    from missm_tpu.cli.export import main as export_main
    from missm_tpu.cli.predict import main as predict_main
    from missm_tpu.cli.train import main as train_main

    csv = make_mvsa_tree(str(tmp_path / "mvsa_multiple"), write_media=True)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)

    common = ["--datasetName", "mvsa", "--csv_path", csv,
              "--modality_types", "language", "image",
              "--fusion_type", "sum", "--model_scale", "tiny",
              "--hash_tokenizer", "--batch_size", "4"]
    train_main(common + ["--init", "random", "--num_epochs", "1"])
    export_main(common + ["--output", "art"])
    assert os.path.exists("art/model.stablehlo")

    predict_main(common + ["--artifact", "art", "--output", "art_preds.csv"])
    predict_main(common + ["--output", "live_preds.csv"])
    a = pd.read_csv("art_preds.csv")
    b = pd.read_csv("live_preds.csv")
    assert len(a) == len(b) == 10
    assert (a["pred"] == b["pred"]).all()
    np.testing.assert_allclose(a["confidence"], b["confidence"], atol=1e-5)


def test_multichip_artifact_matches_single_device(tmp_path):
    """mesh= exports a GSPMD-sharded serving program (batch P('data')):
    the manifest records the device count, the loader rebuilds the mesh
    and shards inputs, and predictions match the single-device artifact
    bitwise."""
    from missm_tpu.core.mesh import make_mesh

    cfg, params = _setup()
    single = str(tmp_path / "single")
    multi = str(tmp_path / "multi")
    export_artifact(params, cfg, _batch(8), single)
    mesh = make_mesh(n_data=8, n_model=1)
    export_artifact(params, cfg, _batch(8), multi, mesh=mesh)

    manifest = json.load(open(os.path.join(multi, "manifest.json")))
    assert manifest["num_devices"] == 8
    assert manifest["data_axis"] == 8

    art_s = load_artifact(single)
    art_m = load_artifact(multi)
    data = _batch(8, rng_seed=2)
    missing = np.array([0, 1, 4, 0, 1, 4, 0, 0], np.int32)
    p_s, pr_s = art_s.predict_arrays(data, missing)
    p_m, pr_m = art_m.predict_arrays(data, missing)
    np.testing.assert_array_equal(p_s, p_m)
    np.testing.assert_allclose(pr_s, pr_m, atol=1e-6, rtol=1e-6)

    # an indivisible batch dim fails loudly at export
    with pytest.raises(ValueError, match="not divisible"):
        export_artifact(params, cfg, _batch(6), str(tmp_path / "bad"),
                        mesh=mesh)
