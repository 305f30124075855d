"""Training entry point — mirrors `train_ddp.py` end to end.

python -m missm_tpu.cli.train --datasetName mvsa --fusion_type sum \
    --modality_types language image --csv_path .../label.csv

The DDP/NCCL setup of the reference becomes: one mesh over all local
devices, batch sharded on the data axis, params replicated (or TP-sharded
with --mesh_model > 1).
"""
from __future__ import annotations

import os

import jax

from ..compat.args import train_args
from ..data.loaders import training_loader
from ..parallel import partition_params
from ..train.checkpoint import restore_checkpoint
from ..train.loop import PreemptedError, train_loop
from .common import (FORCE_TRAIN_MISSING, build_model_config, init_params,
                     make_device_put, make_loader_fns, make_tokenizer,
                     setup_mesh, validate_pipe_batch)


def main(argv=None):
    args = train_args(argv)
    if args.fusion_type in FORCE_TRAIN_MISSING:
        args.train_missing = True  # reference train_ddp.py:163-164

    # set_seed equivalent (train_ddp.py:50-54). Improvement over the
    # reference: python `random` is seeded too, so the train-time missing
    # draws (random.choice in the datasets) are reproducible.
    import random

    import numpy as _np
    random.seed(args.seed)
    _np.random.seed(args.seed)

    experiment = f"{args.datasetName}_{args.fusion_type}"
    save_path = os.path.join("./experiments", experiment, args.save_path)
    log_dir = os.path.join("./experiments", experiment, args.log_dir)
    final_dir = "./final_model"
    os.makedirs(save_path, exist_ok=True)
    os.makedirs(final_dir, exist_ok=True)

    mesh = setup_mesh(args)
    # DDP parity: the reference's --batch_size is per-device
    # (train_ddp.py:38); the global batch is bs x data-axis size.
    n_data = mesh.shape["data"]
    args.batch_size = args.batch_size * (n_data // jax.process_count())
    validate_pipe_batch(args, mesh)

    tokenizer = make_tokenizer(args)
    media_loaders = make_loader_fns(args)
    train_loader_, valid_loader, num_classes = training_loader(
        args, args.csv_path, tokenizer, media_loaders,
        num_shards=jax.process_count(), shard_index=jax.process_index())

    cfg = build_model_config(args, num_classes, mesh=mesh)
    key = jax.random.PRNGKey(args.seed)
    params = init_params(args, cfg, key)

    teacher_fusion = None
    if args.fusion_type in ("MTD_stu", "KL_stu"):
        # load the Distill_tea final model; its encoder weights replace the
        # (shared) student encoder, its fusion params become the teacher
        # (the reference shares one encoder object, train_ddp.py:191-196)
        tea_path = os.path.join(final_dir,
                                f"{args.datasetName}_Distill_tea")
        tree, _ = restore_checkpoint(tea_path)
        params = {"encoder": tree["params"]["encoder"],
                  "fusion": params["fusion"]}
        teacher_fusion = tree["params"]["fusion"]

    if getattr(args, "frozen_bf16", False):
        # bit-identical under --bf16 (model_forward casts the encoder tree
        # to bf16 in-jit regardless); drops the frozen partition's unread
        # f32 master copy — HBM headroom for richer --remat policies
        from ..train.trainability import cast_frozen_params
        params = cast_frozen_params(params, cfg)

    params = partition_params(params, mesh, tp=args.mesh_model > 1,
                              fsdp=getattr(args, "fsdp", False),
                              pipe=getattr(args, "mesh_pipe", 1) > 1)
    device_put = make_device_put(mesh, cast_bf16=args.bf16)

    writer = None
    if jax.process_index() == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(log_dir=log_dir)
        except ImportError:
            pass

    resume_from = getattr(args, "resume", None)
    if resume_from == "auto":
        # pick up a prior run's resume point when one exists (the
        # preemption-restart idiom: the SAME command line works for the
        # first launch and every restart)
        cand = os.path.join(save_path, "last")
        # .old: a crash between _write's two renames leaves only the
        # demoted-but-complete checkpoint — restore_checkpoint resolves
        # it, so count it as resumable here too (a fresh restart would
        # rmtree it on its first checkpoint write, destroying the one
        # recoverable artifact in exactly the window the atomic swap
        # exists for)
        resume_from = cand if (os.path.isdir(cand)
                               or os.path.isdir(cand + ".old")) else None
        if resume_from is None:
            print("--resume auto: no checkpoint at "
                  f"{cand} — starting fresh")

    try:
        best_params, history = train_loop(
            params, cfg, train_loader_, valid_loader,
            num_epochs=args.num_epochs, learning_rate=args.learning_rate,
            weight_decay=args.weight_decay, patience=args.patience,
            teacher_fusion=teacher_fusion, seed=args.seed,
            save_dir=save_path,
            final_path=os.path.join(final_dir, experiment),
            device_put=device_put, writer=writer,
            args_metadata={k: v for k, v in vars(args).items()},
            accum_steps=getattr(args, "grad_accum", 1),
            profile_dir=getattr(args, "profile_dir", None),
            checkpoint_every=getattr(args, "checkpoint_every", 0),
            resume_from=resume_from)
    except PreemptedError:
        # resume checkpoint already landed; EX_TEMPFAIL tells schedulers
        # the run is retriable (relaunch the same command: --resume auto
        # picks the checkpoint up)
        if writer is not None:
            writer.close()
        raise SystemExit(75)

    if writer is not None:
        writer.close()
    print("Training completed!")
    return best_params, history


if __name__ == "__main__":
    main()
