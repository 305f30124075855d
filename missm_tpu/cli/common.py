"""Shared CLI plumbing: model construction from args, tokenizer/media-loader
wiring, checkpoint-based initialization, mesh setup."""
from __future__ import annotations

import os
from typing import Dict

import jax

from ..core.config import TowerConfig, languagebind_large, tiny_tower
from ..core.mesh import make_mesh
from ..data.preprocess import make_media_loaders
from ..data.tokenizer import load_tokenizer
from ..models.encoder import build_encoder_params
from ..models.finetune import ModelConfig, init_model_params
from ..models.fusion import FusionConfig
from ..parallel import shard_batch

# fusion types that force train-time missing simulation
# (reference train_ddp.py:163-164)
FORCE_TRAIN_MISSING = ("regression", "unified_graph", "dedicated_dnn",
                       "MTD_stu", "KL_stu", "self_distill")


def clip_modalities(modality_types):
    return [m for m in modality_types if m != "language"]


def build_tower_cfgs(args) -> Dict[str, TowerConfig]:
    mods = clip_modalities(args.modality_types)
    if not mods:
        raise ValueError("need at least one non-language modality (the "
                         "language tower aliases the last vision tower's "
                         "text encoder, as in the reference)")
    build = languagebind_large if args.model_scale == "large" else tiny_tower
    cfgs = {m: build(m) for m in mods}
    backend = getattr(args, "video_decode_backend", None)
    if backend and "video" in cfgs:
        import dataclasses
        cfgs["video"] = dataclasses.replace(cfgs["video"],
                                            video_decode_backend=backend)
    return cfgs


def build_model_config(args, num_classes: int, mesh=None) -> ModelConfig:
    towers = build_tower_cfgs(args)
    feature_dims = args.feature_dims
    if args.model_scale == "tiny":
        feature_dims = next(iter(towers.values())).projection_dim
    fusion = FusionConfig(
        fusion_type=args.fusion_type,
        modality_types=tuple(args.modality_types),
        output_dims=num_classes,
        feature_dims=feature_dims,
        fusion_dim=args.fusion_dim,
        dropout_prob=args.dropout_prob,
    )
    pipe = None
    n_pipe = getattr(args, "mesh_pipe", 1)
    if n_pipe > 1:
        if mesh is None:
            raise ValueError("--mesh_pipe > 1 needs the mesh (setup_mesh "
                             "before build_model_config)")
        from ..parallel import PipeConfig
        pipe = PipeConfig(mesh, n_pipe=n_pipe,
                          microbatches=getattr(args, "pipe_microbatches", 0),
                          schedule=getattr(args, "pipe_schedule", "gpipe"))
    return ModelConfig(towers=tuple(towers.items()), fusion=fusion,
                       remat=getattr(args, "remat", False),
                       compute_dtype=("bfloat16"
                                      if getattr(args, "bf16", False)
                                      else "float32"),
                       pipe=pipe)


def _load_torch_state_dict(ckpt_dir: str):
    for name in ("pytorch_model.bin", "model.safetensors"):
        p = os.path.join(ckpt_dir, name)
        if os.path.exists(p):
            if name.endswith(".bin"):
                import torch
                return torch.load(p, map_location="cpu", weights_only=True)
            from safetensors.numpy import load_file
            return load_file(p)
    raise FileNotFoundError(
        f"no checkpoint (pytorch_model.bin / model.safetensors) in "
        f"{ckpt_dir}")


def init_params(args, cfg: ModelConfig, key):
    """'random': fresh init. 'checkpoint': convert LanguageBind HF
    checkpoints found under `checkpoint_dir/LanguageBind_<Modality>`
    (the reference's `LanguageBind/<name>` hub layout, cached locally)."""
    if args.init == "random":
        return init_model_params(key, cfg)

    from ..compat.convert import convert_tower_state_dict
    from ..models.fusion import init_fusion

    towers = {}
    names = {"image": "LanguageBind_Image", "video": "LanguageBind_Video",
             "audio": "LanguageBind_Audio", "depth": "LanguageBind_Depth",
             "thermal": "LanguageBind_Thermal"}
    from ..models.tower import inject_lora

    tower_cfgs = cfg.tower_dict
    for m, tcfg in tower_cfgs.items():
        ckpt_dir = os.path.join(args.checkpoint_dir, names[m])
        sd = _load_torch_state_dict(ckpt_dir)
        tp = convert_tower_state_dict(sd, tcfg)
        key, sub = jax.random.split(key)
        # the reference applies LoRA after loading (modeling_image.py:772)
        tp["vision"] = inject_lora(sub, tp["vision"], tcfg.vision)
        towers[m] = tp
    encoder = build_encoder_params(towers, list(tower_cfgs))
    k1, _ = jax.random.split(key)
    return {"encoder": encoder, "fusion": init_fusion(k1, cfg.fusion)}


def make_tokenizer(args):
    any_tower = next(iter(build_tower_cfgs(args).values()))
    context = any_tower.text.max_position_embeddings
    text_vocab = any_tower.text.vocab_size
    tok = load_tokenizer(args.vocab_file, args.merges_file,
                         context_length=context,
                         allow_hash_fallback=getattr(args, "hash_tokenizer",
                                                     False))
    from ..data.tokenizer import HashTokenizer
    if isinstance(tok, HashTokenizer):
        tok.vocab_size = text_vocab
        tok.bos_id = text_vocab - 2
        tok.eos_id = text_vocab - 1
    return tok


def make_loader_fns(args):
    towers = build_tower_cfgs(args)
    return make_media_loaders(
        towers, reference_randomness=getattr(args, "reference_randomness",
                                             False),
        seed=args.seed,
        quantized=getattr(args, "uint8_upload", False))


def enable_cache():
    from ..core.cache import enable_compilation_cache
    enable_compilation_cache()


def maybe_init_distributed(args):
    """Multi-host startup: the NCCL `init_process_group` equivalent
    (reference train_ddp.py:145) is `jax.distributed.initialize` — either
    from the launcher env (--distributed true) or from an explicit
    (coordinator, num_processes, process_id) triple (--distributed
    host:port,N,i — the `env://` rendezvous analogue, parsed loudly by
    compat.args._distributed)."""
    dist = getattr(args, "distributed", False)
    if isinstance(dist, tuple):
        addr, num, pid = dist
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=num, process_id=pid)
    elif dist:
        jax.distributed.initialize()


def setup_mesh(args):
    enable_cache()
    maybe_init_distributed(args)
    n_model = getattr(args, "mesh_model", 1)
    n_pipe = getattr(args, "mesh_pipe", 1)
    mesh = make_mesh(n_model=n_model, n_pipe=n_pipe)
    return mesh


def validate_pipe_batch(args, mesh) -> None:
    """Train-time --mesh_pipe constraint, checked once the mesh exists:
    the GLOBAL per-step batch (per-device --batch_size x data axis,
    after the --grad_accum split) must divide into M whole pipeline
    microbatches — fail with a clear message instead of a trace-time
    ValueError deep inside the first jitted step. Call AFTER the
    per-device -> per-process batch scaling in cli/train.py."""
    n_pipe = getattr(args, "mesh_pipe", 1)
    if n_pipe <= 1:
        return
    import jax as _jax

    m = getattr(args, "pipe_microbatches", 0) or n_pipe
    accum = getattr(args, "grad_accum", 1)
    global_b = args.batch_size * _jax.process_count()
    per_step = global_b // accum
    if global_b % accum or per_step % m:
        raise SystemExit(
            f"--mesh_pipe {n_pipe}: global batch {global_b} "
            f"(per-device --batch_size x data axis)"
            + (f" / --grad_accum {accum}" if accum > 1 else "")
            + f" = {per_step} rows per step is not divisible into {m} "
              f"pipeline microbatches"
            + (f" (--pipe_microbatches {m})" if m != n_pipe else ""))


def round_eval_batch(args, mesh) -> int:
    """Round the (global) eval batch up so every static step shape is
    valid: a multiple of the data axis (even GSPMD batch sharding) and,
    under --mesh_pipe, of the pipeline microbatch count M (the GPipe
    schedule splits the batch into M whole microbatches). The eval pass
    pads partial batches, so metrics are unaffected."""
    import math

    n_data = mesh.shape["data"]
    mult = n_data
    if getattr(args, "mesh_pipe", 1) > 1:
        m = getattr(args, "pipe_microbatches", 0) or args.mesh_pipe
        mult = mult * m // math.gcd(mult, m)
    args.batch_size = -(-args.batch_size // mult) * mult
    return args.batch_size


def make_device_put(mesh, cast_bf16: bool = False):
    """Host->device batch transfer. With cast_bf16 (the --bf16 towers),
    float32 media arrays are cast to bfloat16 ON THE HOST before the
    transfer: model_forward casts them to the compute dtype on device
    anyway, so this is numerically identical and halves the upload bytes
    (19 MB vs 38.5 MB per ViT-L b64 batch through the tunnel)."""
    if not cast_bf16:
        return lambda tree: shard_batch(tree, mesh)
    import ml_dtypes
    import numpy as _np

    def _cast(x):
        if isinstance(x, _np.ndarray) and x.dtype == _np.float32:
            return x.astype(ml_dtypes.bfloat16)
        return x

    def put(tree):
        tree = jax.tree_util.tree_map(_cast, tree)
        return shard_batch(tree, mesh)
    return put
