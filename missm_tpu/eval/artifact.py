"""Hermetic serving artifacts via `jax.export` (StableHLO).

The reference has no deployment story: serving a trained model means
re-running `test.py`'s model construction — HF tower downloads, peft,
the full python stack (reference test.py:64-94). Here the trained
model's inference function is lowered ONCE to versioned StableHLO with
the parameters embedded as constants; the resulting artifact executes
on any matching PJRT runtime through `jax.export.deserialize` without
model code, configs, or checkpoint plumbing — and is what a production
inference service should load.

Contents of an artifact directory:
  model.stablehlo   serialized jax.export.Exported bytes (params inline)
  manifest.json     input/output contract: batch size, per-modality input
                    shapes/dtypes, class count, export platforms, versions

The exported function has the same signature as `Predictor._predict`
minus the params: `(data, missing_index) -> {"probs", "preds"}`, at one
static batch shape (serve partial batches through
`ServingArtifact.predict_arrays`, which pads and slices like the
Predictor does).
"""
from __future__ import annotations

import json
import os
from typing import Mapping, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..models.finetune import ModelConfig, model_forward

ARTIFACT_FILE = "model.stablehlo"
MANIFEST_FILE = "manifest.json"


def _spec_tree(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        tree)


def _manifest_inputs(tree):
    def leaf(x):
        x = np.asarray(x)
        return {"shape": list(x.shape), "dtype": str(x.dtype)}
    return jax.tree_util.tree_map(leaf, tree)


def export_artifact(params, cfg: ModelConfig, example_data: Mapping,
                    out_dir: str, *, platforms: Optional[Sequence[str]] = None,
                    mesh=None,
                    extra_manifest: Optional[Mapping] = None) -> str:
    """Serialize the inference function for `params`/`cfg` to `out_dir`.

    example_data: one batched input tree ({modality: array-or-token-dict})
    fixing the compiled shapes; its batch dim is the artifact's batch size.
    platforms: lowering platforms (default: the current backend). Note the
    fused Pallas kernels only lower on TPU — cross-platform artifacts
    ('tpu','cpu') require shapes that take the XLA fallback paths.
    mesh: optional jax.sharding.Mesh — exports a MULTI-CHIP serving
    program: inputs/outputs sharded P('data') on the batch dim, params
    embedded replicated, GSPMD partitioning baked into the StableHLO.
    The loader must run it under a mesh of the same device count
    (load_artifact rebuilds one from the manifest); the batch dim must
    divide the data axis.
    """
    from jax import export as jax_export
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = len(next(iter(
        v["input_ids"] if isinstance(v, Mapping) else v
        for v in example_data.values())))

    # checkpoint restores hand back host-numpy trees; the closure must be
    # jax arrays or tracing np_weights[token_tracer] fails
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def fn(data, missing_index):
        logits, _ = model_forward(params, cfg, data, missing_index,
                                  train=False)
        return {"probs": jax.nn.softmax(logits, axis=-1),
                "preds": jnp.argmax(logits, axis=-1)}

    data_spec = _spec_tree(example_data)
    mi_spec = jax.ShapeDtypeStruct((batch,), np.int32)
    jit_kw = {}
    if mesh is not None:
        if batch % mesh.shape["data"]:
            raise ValueError(
                f"batch {batch} not divisible by the mesh's data axis "
                f"{mesh.shape['data']} — the exported program shards the "
                f"batch dim")
        data_sh = NamedSharding(mesh, P("data"))
        data_spec = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                           sharding=data_sh), data_spec)
        mi_spec = jax.ShapeDtypeStruct((batch,), np.int32,
                                       sharding=data_sh)
        jit_kw["out_shardings"] = data_sh
    kw = {"platforms": list(platforms)} if platforms else {}
    exported = jax_export.export(jax.jit(fn, **jit_kw), **kw)(
        data_spec, mi_spec)

    os.makedirs(out_dir, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(out_dir, ARTIFACT_FILE), "wb") as f:
        f.write(blob)
    manifest = {
        "format": "jax.export/stablehlo",
        "batch_size": batch,
        "num_classes": int(cfg.fusion.output_dims),
        "modality_types": list(cfg.fusion.modality_types),
        "inputs": _manifest_inputs(example_data),
        "outputs": {"probs": {"shape": [batch, int(cfg.fusion.output_dims)],
                              "dtype": "float32"},
                    "preds": {"shape": [batch], "dtype": "int32"}},
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
        "artifact_bytes": len(blob),
        "num_devices": exported.nr_devices,
        "data_axis": (int(mesh.shape["data"]) if mesh is not None
                      else 1),
    }
    if extra_manifest:
        manifest.update(dict(extra_manifest))
    with open(os.path.join(out_dir, MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return out_dir


class ServingArtifact:
    """A loaded artifact: `.predict_arrays` pads partial batches to the
    compiled batch size and slices results back, like `Predictor`.

    Multi-chip artifacts (manifest num_devices > 1) are executed under a
    (data,) mesh rebuilt from the manifest: inputs are device_put with
    the batch dim sharded P('data') — the same layout the program was
    exported with."""

    def __init__(self, exported, manifest: Mapping):
        self._exported = exported
        self.manifest = dict(manifest)
        self.batch_size = int(manifest["batch_size"])
        self.num_devices = int(manifest.get("num_devices", 1))
        self._mesh = None
        if self.num_devices > 1:
            from jax.sharding import Mesh
            devices = jax.devices()
            if len(devices) < self.num_devices:
                raise ValueError(
                    f"artifact was exported for {self.num_devices} "
                    f"devices; only {len(devices)} available")
            self._mesh = Mesh(
                np.asarray(devices[: self.num_devices]), ("data",))

    def _put(self, tree):
        if self._mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self._mesh, P("data"))
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sh), tree)

    def predict_arrays(self, data: Mapping, missing_index=None):
        from .sweep import _pad_batch

        n = len(next(iter(
            v["input_ids"] if isinstance(v, Mapping) else v
            for v in data.values())))
        target = self.batch_size
        if n > target:
            raise ValueError(
                f"got a batch of {n} rows but the artifact was exported at "
                f"batch_size {target}; chunk the input")
        data = _pad_batch(
            {k: np.asarray(v) if not isinstance(v, Mapping) else v
             for k, v in data.items()}, target)
        if missing_index is None:
            missing_index = np.zeros((target,), np.int32)
        else:
            missing_index = _pad_batch(
                np.asarray(missing_index, np.int32), target)
        out = self._exported.call(self._put(data),
                                  self._put(jnp.asarray(missing_index)))
        return (np.asarray(out["preds"])[:n], np.asarray(out["probs"])[:n])


def load_artifact(path: str) -> ServingArtifact:
    from jax import export as jax_export

    with open(os.path.join(path, ARTIFACT_FILE), "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(path, MANIFEST_FILE)) as f:
        manifest = json.load(f)
    return ServingArtifact(exported, manifest)
