"""Export a trained checkpoint as a hermetic serving artifact
(jax.export / StableHLO — see eval/artifact.py). The artifact embeds the
parameters and runs through any matching PJRT runtime without model code:

python -m missm_tpu.cli.export --datasetName mvsa --csv_path .../label.csv \
    --fusion_type sum --output artifact_dir [--platforms tpu,cpu]

The input shapes are fixed from one real batch of the dataset's given
split (default: test), so the artifact serves exactly what the eval
pipeline produces; batch size = --batch_size.
"""
from __future__ import annotations

import os

from ..compat.args import test_args
from ..data.datasets import DATASET_SPECS, MMDataset, encode_labels
from ..eval.artifact import export_artifact
from ..eval.predictor import Predictor
from ..eval.sweep import _pad_batch
from ..train.checkpoint import restore_checkpoint
from .common import (build_model_config, make_loader_fns, make_tokenizer,
                     round_eval_batch, setup_mesh)


def main(argv=None):
    import sys
    raw = list(argv if argv is not None else sys.argv[1:])
    split, output, platforms = "test", "serving_artifact", None
    for flag in ("--split", "--output", "--platforms"):
        if flag in raw:
            i = raw.index(flag)
            val = raw[i + 1]
            del raw[i:i + 2]
            if flag == "--split":
                split = val
            elif flag == "--output":
                output = val
            else:
                platforms = [p.strip() for p in val.split(",") if p.strip()]
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
                     media_loaders=make_loader_fns(args))
    n = min(len(ds), args.batch_size)
    example = _pad_batch(
        pred._collate_raw([ds[i][0] for i in range(n)]), args.batch_size)

    export_artifact(
        tree["params"], cfg, example, output, platforms=platforms,
        extra_manifest={"datasetName": args.datasetName,
                        "fusion_type": args.fusion_type,
                        "checkpoint": ckpt})
    size = os.path.getsize(os.path.join(output, "model.stablehlo"))
    print(f"wrote {output} ({size / 1e6:.1f} MB, batch {args.batch_size})")
    return output


if __name__ == "__main__":
    main()
