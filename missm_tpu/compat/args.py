"""Argparse surfaces mirroring the reference CLIs flag-for-flag.

`train_args()` mirrors train_ddp.py:19-47, `test_args()` mirrors
test.py:15-40 (same names, same defaults — reference configs run
unchanged), plus a small set of TPU-native extras that default to the
reference behavior:
  --mesh_model       tensor-parallel axis size (1 = pure DP, the reference's
                     only mode)
  --fsdp             ZeRO-3-style sharding of params + optimizer state over
                     the data axis (memory; math identical to DP)
  --mesh_pipe        GPipe pipeline-parallel stages over the block stacks
                     (memory lever for depth; math identical to DP)
  --model_scale      'large' (LanguageBind ViT-L) | 'tiny' (tests/smoke)
  --init             'checkpoint' | 'random' (no-network smoke runs)
  --vocab_file/--merges_file   CLIP BPE files
  --hash_tokenizer             explicit opt-in to the hash stand-in tokenizer
  --reference_randomness       keep the reference's eval-time random flip /
                               audio-chunk draws instead of deterministic eval
  --remat            rematerialize tower blocks (memory for FLOPs)
  --bf16             bfloat16 params/activations on the towers
  --uint8_upload     ship resized image/video batches uint8, normalize
                     on device (4x fewer host->device bytes than f32)
"""
from __future__ import annotations

import argparse


def _bool(v):
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "yes")


def _distributed(v):
    """--distributed value: a bool ('true' = initialize from the launcher
    env) or an explicit 'coordinator_ip:port,num_processes,process_id'
    rendezvous triple. A malformed triple must be a loud parse error —
    silently coercing it to False would run single-host with no warning
    (the torchrun-habit failure mode)."""
    s = str(v).strip()
    if "," not in s and ":" not in s:
        # only explicit bool words take the quiet path — '10.0.0.1' (a
        # forgotten :port,N,i) or 'ture' must NOT coerce to False and
        # silently run single-host
        low = s.lower()
        if low in ("1", "true", "yes", "0", "false", "no", ""):
            return low in ("1", "true", "yes")
        raise argparse.ArgumentTypeError(
            f"--distributed {v!r}: expected true/false or "
            f"'coordinator_ip:port,num_processes,process_id'")
    parts = s.split(",")
    if len(parts) != 3 or ":" not in parts[0]:
        raise argparse.ArgumentTypeError(
            f"--distributed {v!r}: expected true/false or "
            f"'coordinator_ip:port,num_processes,process_id'")
    addr, n, pid = (p.strip() for p in parts)
    try:
        n_i, pid_i = int(n), int(pid)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"--distributed {v!r}: num_processes and process_id must be "
            f"integers")
    if n_i < 1 or not (0 <= pid_i < n_i):
        raise argparse.ArgumentTypeError(
            f"--distributed {v!r}: need num_processes >= 1 and "
            f"0 <= process_id < num_processes")
    return (addr, n_i, pid_i)


_REMAT_POLICIES = ("save_attn", "save_attn_mlp", "save_attn_mlp_kern",
                   "save_attn_mlp_qkv", "save_attn_mlp_qkv_kern",
                   "save_attn_mlp_qkv_sig", "save_attn_mlp_qkv_tkern",
                   "save_attn_mlp_tqkv", "save_most")


def _remat_value(val):
    """One remat value: a policy name or a bool. A typo'd policy must be
    a loud parse error, not a silent False — remat silently off OOMs
    ViT-L workloads (docs/PERF.md)."""
    val = str(val).strip()
    if val in _REMAT_POLICIES:
        return val
    low = val.lower()
    if low in ("1", "true", "yes"):
        return True
    if low in ("0", "false", "no"):
        return False
    raise argparse.ArgumentTypeError(
        f"unknown remat policy {val!r}; expected true/false or one of "
        f"{', '.join(_REMAT_POLICIES)}")


def _remat(v):
    if "=" in str(v):
        # per-modality spec, e.g. "video=True,audio=save_attn_mlp" with an
        # optional default entry ("default=save_attn_mlp"); tower policy
        # economics differ (docs/PERF.md train3 remat sweeps), so the flag
        # accepts one policy per tower. Parsed to a hashable tuple of
        # pairs; resolved per tower by models.encoder._remat_for.
        out = []
        for kv in str(v).split(","):
            k, _, val = kv.partition("=")
            out.append((k.strip(), _remat_value(val)))
        return tuple(out)
    return _remat_value(v)


def _common_model_flags(p: argparse.ArgumentParser):
    p.add_argument("--feature_dims", type=int, default=768,
                   help="the output dims of languagebind")
    p.add_argument("--fusion_dim", type=int, default=256)
    p.add_argument("--dropout_prob", type=float, default=0.1)


def _tpu_extras(p: argparse.ArgumentParser):
    p.add_argument("--config", type=str, default=None,
                   help="YAML config file (flags override file values)")
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + Adam moments over the data axis "
                        "(ZeRO-3 via GSPMD); pure memory lever, math == DP")
    p.add_argument("--mesh_pipe", type=int, default=1,
                   help="pipeline-parallel stages (GPipe over the scanned "
                        "block stack; parallel/pipeline.py). Each stage "
                        "holds layers/stages params + Adam state; "
                        "activations stream over ICI. S must divide every "
                        "pipelined stack's layer count (ViT-L 24 + text "
                        "12: S in {2, 3, 4, 6, 12}). Math == DP; memory "
                        "lever for depth, composes with "
                        "--mesh_model/--fsdp")
    p.add_argument("--pipe_microbatches", type=int, default=0,
                   help="microbatches per pipelined call (0 = mesh_pipe, "
                        "the minimum; more shrinks the (S-1)/(M+S-1) "
                        "bubble at smaller per-microbatch shapes)")
    p.add_argument("--pipe_schedule", type=str, default="gpipe",
                   choices=["gpipe", "1f1b"],
                   help="pipeline schedule: gpipe (autodiff backward — "
                        "all M microbatches' residuals live) or 1f1b "
                        "(memory-capped custom-VJP backward: only stage "
                        "INPUTs saved, ~L/S times fewer live activations "
                        "per stage; same bubble, same math — "
                        "docs/PERF.md)")
    p.add_argument("--model_scale", type=str, default="large",
                   choices=["large", "tiny"])
    p.add_argument("--init", type=str, default="checkpoint",
                   choices=["checkpoint", "random"])
    p.add_argument("--checkpoint_dir", type=str, default="./cache_dir")
    p.add_argument("--vocab_file", type=str, default=None)
    p.add_argument("--merges_file", type=str, default=None)
    p.add_argument("--hash_tokenizer", action="store_true",
                   help="explicitly opt into the deterministic CRC32 hash "
                        "tokenizer (NOT CLIP-compatible; tests/smoke only). "
                        "Without this flag a missing vocab/merges path is a "
                        "hard error")
    p.add_argument("--reference_randomness", type=_bool, default=False)
    p.add_argument("--video_decode_backend", type=str, default="decord",
                   choices=["decord", "opencv", "pytorchvideo"],
                   help="frame-sampling semantics (decode is native FFmpeg "
                        "either way; reference configuration_video.py:205)")
    p.add_argument("--remat", type=_remat, default=True,
                   help="true (full per-block remat), false, save_attn "
                        "(keep attention outputs; ~3-4%% faster training, "
                        "+770 MB at ViT-L b64), save_most (save all but "
                        "the 4d-wide MLP tensors; fastest if it fits), or "
                        "a per-modality spec like "
                        "'video=save_attn_mlp,audio=save_attn_mlp_kern' "
                        "(policy economics differ per tower; docs/PERF.md)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="gradient-accumulation microbatches per step: the "
                        "batch splits into N equal microbatches scanned "
                        "inside the jitted step (one Adam update, one "
                        "microbatch's activations live at a time) — "
                        "effective batches beyond HBM train on-chip. "
                        "batch_size must be divisible by N. Not in the "
                        "reference (A100-80GB never needed it)")
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="write a preemption-safe resume checkpoint "
                        "(TrainState + loop state) to <save_path>/last "
                        "every N epochs, asynchronously off the train "
                        "path (0 = off). Not in the reference (it always "
                        "restarts from scratch)")
    p.add_argument("--resume", type=str, default=None,
                   help="resume training from a --checkpoint_every "
                        "checkpoint: a path, or 'auto' to pick up "
                        "<save_path>/last when it exists (fresh start "
                        "otherwise) — continuation is exact: same rng "
                        "stream, plateau scheduler, best/early-stop "
                        "counters")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler device trace of steady-"
                        "state train steps (epoch-0 batches 4-6) to this "
                        "directory — Perfetto / TensorBoard-profile "
                        "viewable")
    p.add_argument("--bf16", type=_bool, default=True)
    p.add_argument("--frozen_bf16", action="store_true",
                   help="store the FROZEN (non-LoRA vision-block) param "
                        "partition in bf16 — bit-identical under bf16 "
                        "compute (the forward casts the encoder tree to "
                        "bf16 anyway) and frees ~1.2 GB/ViT-L tower of "
                        "HBM for richer --remat policies; requires --bf16")
    p.add_argument("--uint8_upload", type=_bool, default=False,
                   help="ship resized image/video batches to the device as "
                        "uint8 (1 byte/px, 4x fewer tunnel/PCIe bytes than "
                        "f32) and normalize on device inside the jitted "
                        "step; quantize-after-resize bounds the input delta "
                        "at 0.5/255 (below bf16 rounding). Needs the native "
                        "resampler (make -C cpp)")
    p.add_argument("--distributed", type=_distributed, default=False,
                   help="multi-host rendezvous: 'true' reads the launcher "
                        "env (JAX_COORDINATOR_ADDRESS etc.), or an explicit "
                        "'coordinator_ip:port,num_processes,process_id' "
                        "triple — either way jax.distributed.initialize() "
                        "runs before device use")


def train_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    # dataset (train_ddp.py:22-25)
    parser.add_argument("--train_mode", type=str, default="classification",
                        help="regression or classification")
    parser.add_argument("--datasetName", type=str, default="mvsa",
                        help="support mosi/sims/eNTERFACE/AVE/mvsa")
    parser.add_argument("--csv_path", type=str,
                        default="./datasets/mvsa_multiple/label.csv")
    parser.add_argument("--modality_types", type=str, nargs="+",
                        default=["language", "image"],
                        help="subset of language/video/audio/image, ordered")
    # missing (train_ddp.py:28)
    parser.add_argument("--train_missing", type=_bool, default=False)
    # model (train_ddp.py:31-34)
    _common_model_flags(parser)
    parser.add_argument(
        "--fusion_type", type=str, default="sum",
        help="sum/concat/regression/retrieval/intra_attention/"
             "inter_attention/graph_fusion/unified_graph/dedicated_dnn/"
             "[Distill_tea/MTD_stu/KL_stu]/self_distill")
    # training (train_ddp.py:37-46)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--num_epochs", type=int, default=50)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=0)
    parser.add_argument("--patience", type=int, default=8)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--save_path", type=str, default="checkpoints")
    parser.add_argument("--log_dir", type=str, default="logs")
    _tpu_extras(parser)
    return _finalize(parser, argv, train=True)


def test_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    # dataset (test.py:18-21)
    parser.add_argument("--train_mode", type=str, default="classification")
    parser.add_argument("--datasetName", type=str, default="eNTERFACE",
                        help="support mosi/sims/eNTERFACE")
    parser.add_argument("--csv_path", type=str,
                        default="./datasets/eNTERFACE/label.csv")
    parser.add_argument("--modality_types", type=str, nargs="+",
                        default=["video", "audio"])
    # missing (test.py:24)
    parser.add_argument("--test_missing_type", type=str, nargs="+",
                        default=["video", "audio", "mixed"],
                        help="language/video/audio/mixed")
    # model (test.py:27-32)
    parser.add_argument("--model_ckpt_dir", type=str, default="./final_model",
                        help="the ckpt of models")
    _common_model_flags(parser)
    parser.add_argument("--fusion_type", type=str, default="self_distill")
    parser.add_argument("--test_types", type=str, nargs="+",
                        default=["self_distill"],
                        help="fusion type or concat_zero/concat_median/"
                             "concat_mean")
    # other (test.py:35-38)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--missing_index_path", type=str, default=None)
    _tpu_extras(parser)
    return _finalize(parser, argv)


def _finalize(parser: argparse.ArgumentParser, argv, train: bool = False):
    args = parser.parse_args(argv)
    if args.config:
        from .yaml_config import apply_yaml_config, explicit_cli_keys
        import sys
        raw = argv if argv is not None else sys.argv[1:]
        types = {a.dest: a.type for a in parser._actions
                 if a.type is not None}
        apply_yaml_config(args, args.config, explicit_cli_keys(parser, raw),
                          types=types)
    accum = getattr(args, "grad_accum", 1)
    if accum < 1:
        parser.error(f"--grad_accum must be >= 1, got {accum}")
    if accum > 1 and args.batch_size % accum:
        parser.error(f"--batch_size {args.batch_size} must be divisible by "
                     f"--grad_accum {accum} (equal microbatches)")
    n_pipe = getattr(args, "mesh_pipe", 1)
    if n_pipe < 1:
        parser.error(f"--mesh_pipe must be >= 1, got {n_pipe}")
    ck = getattr(args, "checkpoint_every", 0)
    if ck < 0:
        parser.error(f"--checkpoint_every must be >= 0, got {ck}")
    mb = getattr(args, "pipe_microbatches", 0)
    if mb and mb < n_pipe:
        parser.error(f"--pipe_microbatches {mb} < --mesh_pipe {n_pipe}: "
                     f"fewer microbatches than stages leaves stages idle "
                     f"every tick (minimum is one per stage)")
    # NOTE: the train-time pipeline divisibility constraint (the GLOBAL
    # per-step batch must split into M whole microbatches) depends on the
    # data-axis size, which is unknown at parse time — --batch_size is
    # per-device (train_ddp.py:38). cli.common.validate_pipe_batch checks
    # it right after the mesh is built; eval entry points instead round
    # their batch up via round_eval_batch (eval pads partial batches).
    remat = getattr(args, "remat", None)
    if isinstance(remat, tuple):
        # policy VALUES are validated at parse time; keys can only be
        # checked here, against the run's modalities — a typo'd key
        # ("adio=...") would otherwise silently fall through to the
        # default policy, the same misconfiguration class _remat_value
        # fails loudly on
        known = set(getattr(args, "modality_types", []) or []) | {"default"}
        unknown = sorted(k for k, _ in remat if k not in known)
        if unknown:
            parser.error(
                f"--remat names unknown modalities {unknown}; this run's "
                f"modality_types are {sorted(known - {'default'})}")
    return args
