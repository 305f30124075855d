"""Batch inference entry point (serving): load a final checkpoint and write
predictions for a label.csv-style dataset split.

python -m missm_tpu.cli.predict --datasetName mvsa --csv_path .../label.csv \
    --fusion_type sum --split test --output predictions.csv
"""
from __future__ import annotations

import os

import numpy as np

from ..compat.args import test_args
from ..data.datasets import DATASET_SPECS, MMDataset, encode_labels
from ..eval.predictor import Predictor
from ..train.checkpoint import restore_checkpoint
from .common import (build_model_config, make_device_put, make_loader_fns,
                     make_tokenizer, round_eval_batch, setup_mesh)


def main(argv=None):
    import sys
    raw = list(argv if argv is not None else sys.argv[1:])
    split = "test"
    output = "predictions.csv"
    artifact = None
    for flag in ("--split", "--output", "--artifact"):
        if flag in raw:
            i = raw.index(flag)
            val = raw[i + 1]
            del raw[i:i + 2]
            if flag == "--split":
                split = val
            elif flag == "--output":
                output = val
            else:
                artifact = val
    args = test_args(raw)

    mesh = setup_mesh(args)
    round_eval_batch(args, mesh)

    spec = DATASET_SPECS[args.datasetName]
    import pandas as pd
    df = pd.read_csv(args.csv_path, converters={"clip_id": str})
    labels, num_classes = encode_labels(list(df["annotation"]))
    sub = df[df["mode"] == split]
    ds = MMDataset(spec, sub, "/".join(args.csv_path.split("/")[:-1]),
                   labels[df["mode"] == split], split, False)

    samples = [ds[i][0] for i in range(len(ds))]
    if artifact is not None:
        # hermetic path: the StableHLO artifact carries the model and
        # params — no checkpoint restore, no model config, no jit
        from ..eval.artifact import load_artifact
        art = load_artifact(artifact)
        tokenizer, loaders = make_tokenizer(args), make_loader_fns(args)
        preds, probs = [], []
        for i in range(0, len(samples), art.batch_size):
            chunk = samples[i:i + art.batch_size]
            data = {}
            for m in art.manifest["modality_types"]:
                col = [s[m] for s in chunk]
                data[m] = (tokenizer(list(col)) if m == "language"
                           else np.stack([np.asarray(loaders[m](x))
                                          for x in col]))
            p, pr = art.predict_arrays(data)
            preds.append(p)
            probs.append(pr)
        preds, probs = np.concatenate(preds), np.concatenate(probs)
    else:
        cfg = build_model_config(args, num_classes, mesh=mesh)
        ckpt = os.path.join(args.model_ckpt_dir,
                            f"{args.datasetName}_{args.fusion_type}")
        tree, _ = restore_checkpoint(ckpt)

        pred = Predictor(tree["params"], cfg, batch_size=args.batch_size,
                         tokenizer=make_tokenizer(args),
                         media_loaders=make_loader_fns(args),
                         device_put=make_device_put(mesh,
                                                    cast_bf16=args.bf16))
        preds, probs = pred.predict(samples)

    out = pd.DataFrame({
        "index": np.arange(len(ds)),
        "label": [ds[i][1] for i in range(len(ds))],
        "pred": preds,
        "confidence": probs.max(axis=1),
    })
    out.to_csv(output, index=False)
    acc = float((out["label"] == out["pred"]).mean())
    print(f"wrote {output} ({len(out)} rows, accuracy {acc:.4f})")
    return out


if __name__ == "__main__":
    main()
