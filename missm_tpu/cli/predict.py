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
    for flag, default in (("--split", split), ("--output", output)):
        if flag in raw:
            i = raw.index(flag)
            val = raw[i + 1]
            del raw[i:i + 2]
            if flag == "--split":
                split = val
            else:
                output = val
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

    cfg = build_model_config(args, num_classes, mesh=mesh)
    ckpt = os.path.join(args.model_ckpt_dir,
                        f"{args.datasetName}_{args.fusion_type}")
    tree, _ = restore_checkpoint(ckpt)

    pred = Predictor(tree["params"], cfg, batch_size=args.batch_size,
                     tokenizer=make_tokenizer(args),
                     media_loaders=make_loader_fns(args),
                     device_put=make_device_put(mesh, cast_bf16=args.bf16))
    samples = [ds[i][0] for i in range(len(ds))]
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
