"""The parameterized CLIP dual tower — text + vision with LanguageBind extras.

One implementation instantiated per modality replaces the reference's five
byte-identical-modulo-rename modeling files (languagebind/*/modeling_*.py).
Functional style: params are nested dict pytrees, forward fns are pure and
jit-safe. Transformer blocks are *stacked* along a leading layer axis and run
under `lax.scan`, which keeps XLA compile time flat in depth and maps each
layer onto the same compiled matmul kernels.

Reference parity (citations into /root/reference):
- temporal attention + per-layer temporal embedding:
  image/modeling_image.py:105-134 (temporal MLP disabled in the video tower,
  video/modeling_video.py:189-190 — gated by `cfg.temporal_mlp`).
- vision input-shape dispatch (4-D image / 5-D video) and frame-mean pooling:
  image/modeling_image.py:630-643, 662.
- PatchDropout (training-time, CLS kept, per-video shared mask):
  image/modeling_image.py:19-63.
- tube-3D video patch embedding with per-tube CLS tokens:
  video/modeling_video.py:53-130.
- LoRA on the vision encoder attention (or temporal modules when
  add_time_attn): image/modeling_image.py:775-793; scaling alpha/r.
- text EOT pooling by argmax of input_ids: image/modeling_image.py:519-522.
- weight init distributions: image/modeling_image.py:179-231.

Patch embedding is expressed as patch-extraction + one big matmul rather than
a strided convolution: on TPU this lands directly on the MXU with no im2col
lowering, and it is numerically identical to conv with stride == kernel.
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp

from ..core.config import TextConfig, TowerConfig, VisionConfig
from ..ops.attention import multi_head_attention
from ..ops.basic import get_activation, layer_norm, linear


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, std, bias=True, dtype=jnp.float32):
    p = {"w": jax.random.normal(key, (d_in, d_out), dtype) * std}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _init_lora(key, d_in, d_out, r, dtype=jnp.float32):
    """peft defaults: A ~ kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
    B = 0 — so the adapted layer starts exactly at the base layer."""
    ka, _ = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "lora_a": jax.random.uniform(ka, (d_in, r), dtype, -bound, bound),
        "lora_b": jnp.zeros((r, d_out), dtype),
    }


def _init_attn(key, d, num_layers, lora_r=0, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    in_std = (d ** -0.5) * ((2 * num_layers) ** -0.5)
    out_std = d ** -0.5
    p = {
        "q": _init_linear(ks[0], d, d, in_std, dtype=dtype),
        "k": _init_linear(ks[1], d, d, in_std, dtype=dtype),
        "v": _init_linear(ks[2], d, d, in_std, dtype=dtype),
        "out": _init_linear(ks[3], d, d, out_std, dtype=dtype),
    }
    if lora_r:
        for i, name in enumerate(("q", "k", "v", "out")):
            p[name].update(_init_lora(ks[4 + i], d, d, lora_r, dtype))
    return p


def _init_mlp(key, d, d_ff, num_layers, lora_r=0, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    fc_std = (2 * d) ** -0.5
    proj_std = (d ** -0.5) * ((2 * num_layers) ** -0.5)
    p = {
        "fc1": _init_linear(k1, d, d_ff, fc_std, dtype=dtype),
        "fc2": _init_linear(k2, d_ff, d, proj_std, dtype=dtype),
    }
    if lora_r:
        p["fc1"].update(_init_lora(k3, d, d_ff, lora_r, dtype))
        p["fc2"].update(_init_lora(k4, d_ff, d, lora_r, dtype))
    return p


def _init_ln(d, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _init_block(key, d, d_ff, num_layers, *, time_attn=False, temporal_mlp=True,
                num_frames=1, attn_lora=0, tmlp_lora=0, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    p = {
        "ln1": _init_ln(d, dtype),
        "attn": _init_attn(ks[0], d, num_layers,
                           lora_r=0 if time_attn else attn_lora, dtype=dtype),
        "ln2": _init_ln(d, dtype),
        "mlp": _init_mlp(ks[1], d, d_ff, num_layers, dtype=dtype),
    }
    if time_attn:
        p["temporal_embedding"] = (
            jax.random.normal(ks[2], (num_frames, d), dtype) * d ** -0.5)
        p["tln1"] = _init_ln(d, dtype)
        p["tattn"] = _init_attn(ks[3], d, num_layers, lora_r=attn_lora,
                                dtype=dtype)
        if temporal_mlp:
            p["tln2"] = _init_ln(d, dtype)
            p["tmlp"] = _init_mlp(ks[4], d, d_ff, num_layers,
                                  lora_r=tmlp_lora, dtype=dtype)
    return p


def _stack_blocks(blocks):
    """Stack a list of identically-structured block pytrees along axis 0."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *blocks)


def init_text_params(key, cfg: TextConfig, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.num_layers + 2)
    blocks = [
        _init_block(ks[i], cfg.hidden_size, cfg.intermediate_size,
                    cfg.num_layers, dtype=dtype)
        for i in range(cfg.num_layers)
    ]
    return {
        "token_embedding": jax.random.normal(
            ks[-2], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02,
        "position_embedding": jax.random.normal(
            ks[-1], (cfg.max_position_embeddings, cfg.hidden_size), dtype) * 0.02,
        "blocks": _stack_blocks(blocks),
        "final_ln": _init_ln(cfg.hidden_size, dtype),
    }


def init_vision_params(key, cfg: VisionConfig, dtype=jnp.float32):
    d = cfg.hidden_size
    ks = jax.random.split(key, cfg.num_layers + 4)
    blocks = [
        _init_block(ks[i], d, cfg.intermediate_size, cfg.num_layers,
                    time_attn=cfg.add_time_attn, temporal_mlp=cfg.temporal_mlp,
                    num_frames=cfg.num_frames, attn_lora=cfg.lora_r,
                    tmlp_lora=cfg.lora_r if cfg.add_time_attn else 0,
                    dtype=dtype)
        for i in range(cfg.num_layers)
    ]
    patch_in = cfg.num_channels * cfg.patch_size ** 2
    if cfg.use_tube3d:
        patch_in *= cfg.tube_size
    n_cls = (cfg.num_frames // cfg.tube_size) if cfg.use_tube3d else 1
    cls_shape = (n_cls, d) if cfg.use_tube3d else (d,)
    return {
        "class_embedding": jax.random.normal(ks[-4], cls_shape, dtype)
        * (d ** -0.5),
        "patch_embedding": {
            "w": jax.random.normal(ks[-3], (patch_in, d), dtype) * 0.02},
        "position_embedding": jax.random.normal(
            ks[-2], (cfg.num_patches + 1, d), dtype) * 0.02,
        "pre_ln": _init_ln(d, dtype),
        "blocks": _stack_blocks(blocks),
        "post_ln": _init_ln(d, dtype),
    }


def init_tower_params(key, cfg: TowerConfig, dtype=jnp.float32):
    kt, kv, kp1, kp2 = jax.random.split(key, 4)
    return {
        "text": init_text_params(kt, cfg.text, dtype),
        "vision": init_vision_params(kv, cfg.vision, dtype),
        "text_projection": {
            "w": jax.random.normal(
                kp1, (cfg.text.hidden_size, cfg.projection_dim), dtype)
            * (cfg.text.hidden_size ** -0.5)},
        "visual_projection": {
            "w": jax.random.normal(
                kp2, (cfg.vision.hidden_size, cfg.projection_dim), dtype)
            * (cfg.vision.hidden_size ** -0.5)},
        "logit_scale": jnp.asarray(cfg.logit_scale_init, dtype),
    }


def inject_lora(key, vision_params, cfg: VisionConfig, dtype=jnp.float32):
    """Add fresh LoRA A/B params to converted (checkpoint) vision blocks —
    the reference applies `convert_to_lora` AFTER loading pretrained weights
    (image/modeling_image.py:772), so published checkpoints carry no LoRA.

    Targets mirror peft's: temporal attn + temporal mlp when add_time_attn,
    else the spatial self-attention projections (ref :775-783). Stacked
    blocks get one [L, ...] A/B pair per target."""
    if cfg.lora_r == 0:
        return vision_params
    blocks = dict(vision_params["blocks"])
    L = blocks["ln1"]["scale"].shape[0]
    d = cfg.hidden_size

    def fresh(key, d_in, d_out):
        ks = jax.random.split(key, L)
        stacked = [_init_lora(k, d_in, d_out, cfg.lora_r, dtype) for k in ks]
        return {
            "lora_a": jnp.stack([s["lora_a"] for s in stacked], 0),
            "lora_b": jnp.stack([s["lora_b"] for s in stacked], 0),
        }

    if cfg.add_time_attn:
        targets = [("tattn", "q", d, d), ("tattn", "k", d, d),
                   ("tattn", "v", d, d), ("tattn", "out", d, d)]
        if "tmlp" in blocks:
            targets += [("tmlp", "fc1", d, cfg.intermediate_size),
                        ("tmlp", "fc2", cfg.intermediate_size, d)]
    else:
        targets = [("attn", n, d, d) for n in ("q", "k", "v", "out")]

    for mod, leaf, d_in, d_out in targets:
        key, sub = jax.random.split(key)
        sub_params = dict(blocks[mod])
        inner = dict(sub_params[leaf])
        if "lora_a" not in inner:
            inner.update(fresh(sub, d_in, d_out))
        sub_params[leaf] = inner
        blocks[mod] = sub_params
    return dict(vision_params, blocks=blocks)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _block_forward(p, x, *, num_heads, act, eps, bias=None, causal=False,
                   key_bias=None, time=None, lora_scaling=None, remat=False):
    """One pre-LN transformer block; optional factorized temporal attention.

    time: None for text / single-frame paths; else a tuple (T, N) with the
    current frame count and token count (x is [(B*T), N, D]).
    `lora_scaling` applies to self-attn when time is None-lora config, see
    callers: vision passes spatial-lora or temporal-lora per reference.
    """

    def run(p, x):
        h = x
        if time is not None:
            T, N = time
            spatial_lora = None  # LoRA moves to temporal modules (ref :775-783)
            D = h.shape[-1]
            if T != 1:
                # per-layer temporal position embedding (ref :110-114) —
                # a [1,T,1,D] broadcast in the native [B,T,N,D] layout; the
                # reference transposes to frame-minor first, but the add is
                # elementwise so no relayout is needed.
                h = (h.reshape(-1, T, N, D)
                     + p["temporal_embedding"][:T][None, :, None]
                     ).reshape(-1, N, D)
            # temporal attention over the frame axis (ref :117-127);
            # tiny-T instances are MXU-packed (ops.attention.short_attention).
            # tln1 is rowwise over D (layout-agnostic) — apply it BEFORE the
            # [B,T,N,D]->[B,N,T,D] relayout so XLA fuses it with the
            # embedding add and only the normalized copy is transposed.
            from ..ops.attention import short_attention
            res = h
            ht = layer_norm(p["tln1"], h, eps)
            ht = ht.reshape(-1, T, N, D).transpose(0, 2, 1, 3)
            ht = ht.reshape(-1, T, D)
            ht = short_attention(p["tattn"], ht, num_heads=num_heads,
                                 lora_scaling=lora_scaling)
            ht = ht.reshape(-1, N, T, ht.shape[-1]).transpose(0, 2, 1, 3)
            h = res + ht.reshape(-1, N, ht.shape[-1])
            if "tmlp" in p:
                # temporal MLP — live in image/audio/depth/thermal towers,
                # disabled in video (ref video/modeling_video.py:189-190).
                # Every op here (LN, fc1, act, fc2) is per-token over D, so
                # the reference's [B,N,T,D] round-trip is pure relayout
                # cost; run it directly on the [(B*T), N, D] stream.
                from jax.ad_checkpoint import checkpoint_name
                res = h
                ht = layer_norm(p["tln2"], h, eps)
                wide = checkpoint_name(
                    linear(p["tmlp"]["fc1"], ht, lora_scaling=lora_scaling),
                    "mlp_wide")
                wide = checkpoint_name(act(wide), "mlp_wide_act")
                ht = linear(p["tmlp"]["fc2"], wide, lora_scaling=lora_scaling)
                h = res + ht
        else:
            spatial_lora = lora_scaling
        # spatial / sequence attention + MLP (ref :136-151)
        res = h
        hn = layer_norm(p["ln1"], h, eps)
        hn = multi_head_attention(p["attn"], hn, num_heads=num_heads,
                                  bias=bias, causal=causal,
                                  key_bias=key_bias,
                                  lora_scaling=spatial_lora)
        from jax.ad_checkpoint import checkpoint_name
        hn = checkpoint_name(hn, "attn_out")
        h = res + hn
        res = h
        # ln2->fc1 is NOT fused by default: measured exactly neutral at
        # the stack level (scripts/ln_linear_probe.py, r4 — XLA:TPU
        # already keeps this boundary fused). kernels/ln_linear.py holds
        # the kernel; the FUSE_LN2_FC1 trace-time switch keeps the
        # receipt reproducible.
        from ..kernels import ln_linear as _lnl
        if _lnl.FUSE_LN2_FC1 and _lnl.ln_linear_available(
                h, p["mlp"]["fc1"]):
            wide = checkpoint_name(
                _lnl.ln_linear(h, p["ln2"], p["mlp"]["fc1"], eps=eps),
                "mlp_wide")
        else:
            hn = layer_norm(p["ln2"], h, eps)
            wide = checkpoint_name(linear(p["mlp"]["fc1"], hn),
                                   "mlp_wide")
        wide = checkpoint_name(act(wide), "mlp_wide_act")
        h = res + linear(p["mlp"]["fc2"], wide)
        return h

    if remat:
        # remat True/'full': save nothing (min memory). 'save_attn': keep
        # each block's attention output so the MLP-side backward does not
        # re-run the attention kernel (770 MB extra at ViT-L b64).
        # 'save_attn_mlp': additionally keep each block's fc1 pre-activation
        # (the gelu recomputes elementwise) — backward then re-runs only
        # ln1/qkv/ln2/fc1, never the attention kernel or fc2
        # (~4 GB extra at ViT-L b64).
        # 'save_most' (save EVERYTHING except the 4d-wide tensors) was
        # measured WORSE: b64 OOMs and at b32 XLA inserts remat-compression
        # copies that eat the recompute savings — see docs/PERF.md.
        policy = None
        from jax.ad_checkpoint import checkpoint_policies
        if remat == "save_attn":
            policy = checkpoint_policies.save_only_these_names("attn_out")
        elif remat == "save_attn_mlp":
            policy = checkpoint_policies.save_only_these_names(
                "attn_out", "mlp_wide")
        elif remat == "save_attn_mlp_kern":
            # additionally keep the pre-out-projection attention kernel
            # output: with LoRA on the out projection its da/db consume
            # that value, which otherwise forces the backward to replay
            # the forward attention kernel (spatial AND packed temporal —
            # the temporal tag split out as 'tattn_kernel_out' in r4;
            # both are saved here to preserve this policy's measured
            # semantics).
            policy = checkpoint_policies.save_only_these_names(
                "attn_out", "mlp_wide", "attn_kernel_out",
                "tattn_kernel_out")
        elif remat == "save_attn_mlp_qkv":
            # additionally keep the SPATIAL q/k/v projection outputs: the
            # attention-kernel VJP consumes them, so the backward skips
            # the ln1 + qkv matmul replay (~103 GFLOP/layer at 64 ViT-L
            # instances) at ~3x attn_out's memory (ops.attention._qkv).
            # Temporal qkv is tagged 'tqkv' and deliberately NOT saved —
            # it doubles the footprint at video shapes and OOM'd B=8
            # (ops.attention.short_attention).
            policy = checkpoint_policies.save_only_these_names(
                "attn_out", "mlp_wide", "qkv")
        elif remat == "save_attn_mlp_qkv_kern":
            # qkv AND the pre-out-projection kernel output: the backward
            # neither replays ln1+qkv nor the forward attention kernel
            # (which save_attn_mlp_qkv alone still replays — attn_kernel_out
            # feeds the out projection's LoRA da/db). +~0.8 GB over qkv at
            # 64 ViT-L instances; sized for the image b64 config.
            policy = checkpoint_policies.save_only_these_names(
                "attn_out", "mlp_wide", "qkv", "attn_kernel_out",
                "tattn_kernel_out")
        elif remat == "save_attn_mlp_tqkv":
            # the TEMPORAL qkv instead of the spatial one (same footprint
            # at video shapes — B*N*T == B*T*N tokens): the temporal
            # replay carries the [B,T,N,D]<->[B,N,T,D] relayout pair on
            # top of its matmuls, so saving it may buy more than saving
            # the spatial qkv does. Round-4 A/B: see docs/PERF.md.
            policy = checkpoint_policies.save_only_these_names(
                "attn_out", "mlp_wide", "tqkv")
        elif remat == "save_attn_mlp_qkv_tkern":
            # qkv + the TEMPORAL attention kernel output only: the video
            # tower's LoRA'd temporal out projection needs that value in
            # the backward (otherwise the packed temporal kernel replays
            # per layer); the spatial kernel outputs stay unsaved — at 64
            # video instances saving them measured as a regression
            # (save_attn_mlp_qkv_kern row, docs/PERF.md). ~33 MB/layer at
            # train3 B=8.
            policy = checkpoint_policies.save_only_these_names(
                "attn_out", "mlp_wide", "qkv", "tattn_kernel_out")
        elif remat == "save_attn_mlp_qkv_sig":
            # qkv AND the MLP activation's sigmoid: quick_gelu's
            # derivative needs sigmoid(1.702*wide) — with only mlp_wide
            # saved the backward recomputes that transcendental over
            # [inst, N, FF] per layer; saving the named sigmoid
            # (ops.basic.quick_gelu's 'act_sig') trades ~134 MB/layer of
            # bf16 for the VPU recompute.
            policy = checkpoint_policies.save_only_these_names(
                "attn_out", "mlp_wide", "qkv", "act_sig")
        elif remat == "save_most":
            policy = checkpoint_policies.save_anything_except_these_names(
                "mlp_wide", "mlp_wide_act")
        elif remat is not True:
            # raw-string callers (bench kwargs, probe scripts) bypass the
            # argparse validation — an unknown policy must not silently
            # measure full-remat performance
            raise ValueError(f"unknown remat policy {remat!r}; expected "
                             "True or one of compat.args._REMAT_POLICIES")
        run = jax.checkpoint(run, policy=policy)
    return run(p, x)


def _encoder(blocks, x, *, num_heads, act, eps, bias=None, causal=False,
             key_bias=None, time=None, lora_scaling=None, remat=False,
             pipe=None):
    """Scan the stacked blocks over the layer axis.

    With `pipe` (a parallel.pipeline.PipeConfig), the stack runs as a
    GPipe pipeline over the mesh's pipe axis instead: each stage scans its
    L/S local layers and activations stream between stages (numerically
    identical — same per-layer math, different schedule)."""
    kwargs = dict(num_heads=num_heads, act=act, eps=eps, causal=causal,
                  time=time, lora_scaling=lora_scaling, remat=remat)

    if pipe is not None and pipe.n_pipe > 1:
        from ..parallel.pipeline import pipeline_blocks
        names, extras = [], []
        for nm, v in (("bias", bias), ("key_bias", key_bias)):
            if v is not None:
                names.append(nm)
                extras.append(v)
        group = time[0] if time is not None else 1

        def block_fn(blocks_local, h, *ex):
            kw = dict(kwargs, **dict(zip(names, ex)))

            def body(h, p):
                return _block_forward(p, h, **kw), None

            h, _ = jax.lax.scan(body, h, blocks_local)
            return h

        return pipeline_blocks(pipe, blocks, x, tuple(extras), group=group,
                               block_fn=block_fn)

    def body(h, p):
        return _block_forward(p, h, bias=bias, key_bias=key_bias,
                              **kwargs), None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def text_features(params, cfg: TextConfig, input_ids, attention_mask=None, *,
                  remat=False, projection=None, pipe=None):
    """input_ids: [B, L] int32 -> (last_hidden [B, L, D], pooled [B, D]).

    attention_mask: optional [B, L] (1 = attend, 0 = pad), combined
    additively with the causal mask exactly as HF does (reference
    image/modeling_image.py:496-502) — the tokenizer pads to 77 and the
    harness passes the mask through (data_loader.py:76).
    If `projection` is given, pooled is projected (no bias) to the shared
    embedding space (reference image/modeling_image.py:885-888).
    """
    B, L = input_ids.shape
    x = params["token_embedding"][input_ids]
    x = x + params["position_embedding"][:L][None]
    # causal + padding masks are passed structurally so the TPU path can
    # fuse them into the attention kernel (ops.attention routes to
    # fused_attention_causal_ad; the einsum fallback composes the same
    # dense bias the reference builds at image/modeling_image.py:441-455)
    key_bias = None
    if attention_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        key_bias = jnp.where(attention_mask[:, None, :] == 0, neg, 0.0)
    x = _encoder(params["blocks"], x, num_heads=cfg.num_heads,
                 act=get_activation(cfg.hidden_act), eps=cfg.layer_norm_eps,
                 causal=True, key_bias=key_bias, remat=remat, pipe=pipe)
    x = layer_norm(params["final_ln"], x, cfg.layer_norm_eps)
    # EOT pooling: argmax of token ids (EOT has the highest id in CLIP's
    # vocab; reference :519-522). argmax picks the first occurrence, matching
    # torch.
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(B), eot]
    if projection is not None:
        pooled = linear(projection, pooled)
    return x, pooled


def _patchify2d(pixel_values, patch: int):
    """[B, C, H, W] -> [B, gh*gw, C*p*p] with (c, i, j) flattening order,
    matching a torch Conv2d weight reshaped to (D, C*p*p)."""
    B, C, H, W = pixel_values.shape
    gh, gw = H // patch, W // patch
    x = pixel_values.reshape(B, C, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # B gh gw C p p
    return x.reshape(B, gh * gw, C * patch * patch)


def _patchify3d(frames, patch: int, tube: int):
    """[B, T, C, H, W] -> [B, T//tube, gh*gw, C*tube*p*p] with (c, t, i, j)
    flattening, matching torch Conv3d weight (D, C, tube, p, p)."""
    B, T, C, H, W = frames.shape
    gh, gw = H // patch, W // patch
    x = frames.reshape(B, T // tube, tube, C, gh, patch, gw, patch)
    x = x.transpose(0, 1, 4, 6, 3, 2, 5, 7)  # B T' gh gw C tube p p
    return x.reshape(B, T // tube, gh * gw, C * tube * patch * patch)


def _patch_dropout(key, x, B, T, prob: float, row_offset: int = 0):
    """Training-time random patch-token dropout, CLS kept; one mask per video
    shared across its T frames (reference image/modeling_image.py:19-63).

    Each video's randomness derives from fold_in(key, global video index),
    so the dropout stream is invariant to how vision_features chunks the
    batch (chunk_instances / device_count do not change results)."""
    cls_tok, toks = x[:, :1], x[:, 1:]
    n = toks.shape[1]
    keep = max(1, int(n * (1.0 - prob)))
    vid_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(B) + row_offset)
    rand = jax.vmap(lambda k: jax.random.normal(k, (n,)))(vid_keys)
    _, keep_idx = jax.lax.top_k(rand, keep)  # [B, keep]
    if T != 1:
        keep_idx = jnp.repeat(keep_idx, T, axis=0)  # [(B*T), keep]
    toks = jnp.take_along_axis(toks, keep_idx[:, :, None], axis=1)
    return jnp.concatenate([cls_tok, toks], axis=1)


def vision_features(params, cfg: VisionConfig, pixel_values, *, train=False,
                    rng=None, remat=False, projection=None, pipe=None):
    """pixel_values: [B, C, H, W] or [B, C, T, H, W] -> pooled [B, D].

    Shape dispatch mirrors reference image/modeling_image.py:630-643; pooling
    is CLS -> post-LN -> mean over frames (:659-662).

    Large batches are processed in whole-video chunks of ~64 ViT instances
    per device: the composed transformer block measures ~13% slower per
    instance at 128 instances than at 64 on v5e (XLA schedules the b64
    shapes better — scripts/video_pieces_probe.py), so a 16-video 8-frame
    batch runs as two sequential 64-instance programs inside the same jit.
    Patch-dropout randomness is per-video (fold_in of the global video
    index), so chunking does not change the dropout stream.
    """
    if pixel_values.ndim == 7:
        t_raw = pixel_values.shape[2]
        t_eff = (t_raw // cfg.tube_size) if cfg.use_tube3d else t_raw
        inst_per = pixel_values.shape[1] * t_eff * pixel_values.shape[3]
    elif pixel_values.ndim == 5:
        t_raw = pixel_values.shape[2]
        inst_per = (t_raw // cfg.tube_size) if cfg.use_tube3d else t_raw
    else:
        inst_per = 1
    chunk_inst = cfg.chunk_instances or 64 * jax.device_count()
    bv = pixel_values.shape[0]
    per_chunk = max(1, chunk_inst // max(inst_per, 1))
    if pipe is not None and pipe.n_pipe > 1:
        # each chunk runs its own GPipe schedule, whose microbatch count M
        # must divide the chunk's video count — round the chunk size to a
        # multiple of M (the ragged last chunk then stays a multiple too,
        # because callers pad batches to an M multiple)
        m = pipe.m
        per_chunk = max(m, per_chunk - per_chunk % m)
    if bv > per_chunk:
        n_chunks = -(-bv // per_chunk)
        pooled = jnp.concatenate([
            _vision_features_chunk(params, cfg,
                                   pixel_values[i * per_chunk:
                                                (i + 1) * per_chunk],
                                   train=train, rng=rng, remat=remat,
                                   projection=projection,
                                   row_offset=i * per_chunk, pipe=pipe)
            for i in range(n_chunks)], axis=0)
        return pooled
    return _vision_features_chunk(params, cfg, pixel_values, train=train,
                                  rng=rng, remat=remat, projection=projection,
                                  pipe=pipe)


def _vision_features_chunk(params, cfg: VisionConfig, pixel_values, *,
                           train=False, rng=None, remat=False,
                           projection=None, row_offset: int = 0, pipe=None):
    if pixel_values.ndim == 7:
        # (b, pair, T, bs, c, h, w) — the reference's 7-D retrieval-pair
        # layout (image/modeling_image.py:630-634): flatten to (B, T, C, H, W)
        b_new, pair, T, bs, C, H, W = pixel_values.shape
        B = b_new * pair * bs
        # row_offset arrives in outer-batch units (vision_features chunk
        # index); _patch_dropout folds in GLOBAL video indices, and each
        # outer row holds pair*bs videos here — rescale so chunked runs
        # never reuse a video's dropout mask across chunks.
        row_offset = row_offset * pair * bs
        frames = pixel_values.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
            B, T, C, H, W)
        lhs, dims = frames, ("NTCHW", "ITHWO", "NTHWC")
    elif pixel_values.ndim == 5:
        B, C, T, H, W = pixel_values.shape
        # native channels-first layout: the frame-major transpose the
        # patchify formulation needed disappears into the conv's im2col
        lhs, dims = pixel_values, ("NCTHW", "ITHWO", "NTHWC")
    else:
        B, C, H, W = pixel_values.shape
        T = 1
        lhs, dims = pixel_values[:, None], ("NTCHW", "ITHWO", "NTHWC")

    d = cfg.hidden_size
    # Patch embedding as a strided XLA conv (stride == window, so it lowers
    # to an MXU matmul with the im2col gather fused) — the explicit
    # _patchify2d/3d transpose produces 14-element minor dims, a measured
    # ~1.8x slower relayout (scripts/video_pieces_probe.py). Weight stays
    # in the torch (D, C[, tube], p, p) flattening used by the converter.
    p_sz = cfg.patch_size
    if cfg.use_tube3d:
        w = params["patch_embedding"]["w"].reshape(
            C, cfg.tube_size, p_sz, p_sz, d)
        strides = (cfg.tube_size, p_sz, p_sz)
    else:
        w = params["patch_embedding"]["w"].reshape(C, p_sz, p_sz, d)[:, None]
        strides = (1, p_sz, p_sz)
    # No preferred_element_type: the MXU accumulates bf16 convs in f32
    # regardless and the old dot formulation rounded straight back to the
    # input dtype; a f32 output here would also make the conv VJP mix a
    # f32 cotangent with bf16 operands, which lax.conv rejects.
    emb = jax.lax.conv_general_dilated(
        lhs, w.astype(lhs.dtype), window_strides=strides, padding="VALID",
        dimension_numbers=dims)                      # [B, T', gh, gw, d]
    T_eff = emb.shape[1]
    if cfg.use_tube3d:
        emb = emb.reshape(B, T_eff, -1, d)
        cls = jnp.broadcast_to(params["class_embedding"][None, :, None, :],
                               (B, T_eff, 1, d))
        x = jnp.concatenate([cls, emb], axis=2)
        x = x + params["position_embedding"][None, None]
        x = x.reshape(B * T_eff, -1, d)
        T = T_eff
    else:
        emb = emb.reshape(B * T, -1, d)
        cls = jnp.broadcast_to(params["class_embedding"][None, None, :],
                               (B * T, 1, d))
        x = jnp.concatenate([cls, emb], axis=1)
        x = x + params["position_embedding"][None]

    if train and cfg.force_patch_dropout > 0.0:
        if rng is None:
            raise ValueError("patch dropout needs an rng key in training mode")
        x = _patch_dropout(rng, x, B, T, cfg.force_patch_dropout,
                           row_offset=row_offset)

    x = layer_norm(params["pre_ln"], x, cfg.layer_norm_eps)

    lora_scaling = (cfg.lora_alpha / cfg.lora_r) if cfg.lora_r else None
    time = (T, x.shape[1]) if cfg.add_time_attn else None
    x = _encoder(params["blocks"], x, num_heads=cfg.num_heads,
                 act=get_activation(cfg.hidden_act), eps=cfg.layer_norm_eps,
                 time=time, lora_scaling=lora_scaling, remat=remat, pipe=pipe)

    pooled = x[:, 0, :]
    pooled = layer_norm(params["post_ln"], pooled, cfg.layer_norm_eps)
    pooled = pooled.reshape(B, T, -1).mean(axis=1)
    if projection is not None:
        pooled = linear(projection, pooled)
    return pooled


def tower_forward(params, cfg: TowerConfig, input_ids, pixel_values, *,
                  train=False, rng=None, remat=False):
    """Contrastive dual-tower forward: returns (logits_per_image,
    logits_per_text, text_embeds, image_embeds) as in reference
    image/modeling_image.py:941-1030."""
    from ..ops.basic import l2_normalize

    _, text_pooled = text_features(params["text"], cfg.text, input_ids,
                                   remat=remat,
                                   projection=params["text_projection"])
    image_pooled = vision_features(params["vision"], cfg.vision, pixel_values,
                                   train=train, rng=rng, remat=remat,
                                   projection=params["visual_projection"])
    te = l2_normalize(text_pooled)
    ie = l2_normalize(image_pooled)
    scale = jnp.exp(params["logit_scale"])
    logits_per_text = te @ ie.T * scale
    return logits_per_text.T, logits_per_text, te, ie
