"""Benchmark: samples/sec/chip on the flagship model under
modality-dropout masks — eval, train, and the 3-tower (video+audio+
language) eval (VERDICT r1 #9).

Prints ONE JSON line. Primary fields are the image+text eval step (the
metric tracked since BENCH_r01); `extra_metrics` carries the train step
and the 3-tower eval. `vs_baseline` divides by the committed analytic
estimate of the reference stack (PyTorch eager, bf16) on A100-80GB —
derivation in docs/BASELINE_ESTIMATE.md. The reference itself publishes
no numbers (BASELINE.md).

Timing methodology (round 2, third pass): `iters` steps run INSIDE one
jitted `lax.fori_loop` — one dispatch, one scalar readback — because on
the tunneled platform every host-issued dispatch costs ~25 ms whether or
not anything is read back (a 2.2 ms text tower measures 28 ms/iter from
a host loop; scripts/temporal_pieces_probe.py history in docs/PERF.md).
Host-loop chaining therefore under-reports chip throughput by ~25 ms per
step; the in-jit loop measures the pure device rate, which is what a
production (local-host) deployment gets. Iterations stay honest inside
the loop: eval steps consume a data tensor chained to the previous
step's loss plus a rotating missing mask, and train steps carry the
optimizer state forward with a per-iteration fold_in PRNG key, so XLA
cannot elide or batch the steps.

Workloads (LanguageBind-Large scale, bf16, random modality-dropout codes):
- eval:  ViT-L/14 image tower + CLIP text tower + sum fusion, batch 64
- train: same model, Adam, LoRA-frozen base, save_attn_mlp_qkv_kern
  remat + 4x16 in-jit gradient accumulation, batch 64
- eval3: video (8-frame + temporal attn) + audio (112x1036 mel) +
  language towers + sum fusion, batch 16
- train3: the eval3 model's train step (Adam, LoRA-frozen bf16 bases,
  per-tower remat video=save_attn_mlp_qkv / audio=save_attn_mlp_kern),
  batch 8
- duty (extra metrics, bounded child runs): AV input-pipeline duty
  cycle on mixed-shape real media under the default and --uint8_upload
  configs — the BASELINE.md >0.9 north star, machine-checked per round
  (also dumped to DUTY_last.json).
"""
from __future__ import annotations

import json
import time

import numpy as np

# Analytic A100 estimates (samples/s) — docs/BASELINE_ESTIMATE.md
A100_EVAL_IMAGE_TEXT = 712.0
A100_TRAIN_IMAGE_TEXT = 237.0
A100_EVAL_THREE_TOWER = 58.9
A100_TRAIN_THREE_TOWER = 19.6


def _text_ids(rng, B):
    ids = np.full((B, 77), 49407, np.int32)
    ids[:, 0] = 49406
    ids[:, 1:12] = rng.integers(1, 40000, size=(B, 11))
    return ids


def _time_loop(loop, *args, reps=3):
    """Compile+warm with one call, then time `reps` further calls and
    return the fastest. Each call is already `iters` steps inside one
    jitted fori_loop (dispatch cost amortized); the min over reps drops
    transient tunnel/readback stalls (the platform's host<->device hop
    swings 13-124 MB/s between sessions, docs/PERF.md) and reports the
    sustained device rate."""
    import jax.numpy as jnp
    float(jnp.asarray(loop(*args), jnp.float32))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.asarray(loop(*args), jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best


def _eval_model(jnp, jax, towers, modality_types, B, data_extra):
    from missm_tpu.models.finetune import ModelConfig, init_model_params
    from missm_tpu.models.fusion import FusionConfig

    fusion = FusionConfig(fusion_type="sum", modality_types=modality_types,
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    rng = np.random.default_rng(0)
    data = {"language": jnp.asarray(_text_ids(rng, B))}
    data.update({k: jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
                 for k, shape in data_extra.items()})
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    return cfg, params, data, labels, rng


def _apply_chunk(towers, chunk):
    """Per-tower chunk_instances override, e.g. (("video", 32),): run
    that tower's fwd+bwd in 32-instance chunks (4 videos at 8 frames)
    instead of one 64-instance program — the composed fwd+bwd stack
    schedules best at 16-32 instances (scripts/bwd_chunk_probe.py)."""
    if not chunk:
        return towers
    import dataclasses
    cmap = dict(chunk)
    return tuple(
        (name, dataclasses.replace(
            t, vision=dataclasses.replace(
                t.vision, chunk_instances=cmap[name]))
         if name in cmap else t)
        for name, t in towers)


def bench_eval(jnp, jax, iters=20, B=64):
    from missm_tpu.core.config import languagebind_large
    from missm_tpu.train.step import make_eval_step

    towers = (("image", languagebind_large("image")),)
    cfg, params, data, labels, rng = _eval_model(
        jnp, jax, towers, ("language", "image"), B,
        {"image": (B, 3, 224, 224)})
    masks = jnp.stack([jnp.asarray(rng.choice([0, 1, 4], B), jnp.int32)
                       for _ in range(4)])
    eval_step = make_eval_step(cfg)

    @jax.jit
    def loop(params, data, labels, masks):
        def body(i, carry):
            chain, acc = carry
            out = eval_step(params, dict(data, image=chain), labels,
                            masks[i % 4])
            acc = acc + out["loss"].astype(jnp.float32)
            chain = chain + (out["loss"] * 0).astype(chain.dtype)
            return (chain, acc)
        _, acc = jax.lax.fori_loop(0, iters, body,
                                   (data["image"], jnp.float32(0)))
        return acc

    dt = _time_loop(loop, params, data, labels, masks)
    return B * iters / dt


def bench_train(jnp, jax, iters=10, B=64, remat="save_attn_mlp_qkv_kern",
                frozen_bf16=False, accum_steps=4, chunk=()):
    """Bench config (round 4): save_attn_mlp_qkv_kern remat + 4x16
    in-jit gradient accumulation.

    accum_steps=4 (scripts/bwd_chunk_probe.py): the composed fwd+bwd
    stack schedules best at 16-32 instances/microbatch (us/inst
    2875/2855/2955/3235/3408 at 16/32/64/96/128) — the backward analog
    of the forward's 64-instance chunking optimum. In-jit microbatched
    accumulation at 4x16 runs the SAME b64 batch + one Adam update
    (math pinned by test_grad_accum_matches_manual_microbatching) at
    272.9-273.0 vs 263.9 samples/s flat (+3.4%, min-of-3 each, same
    session; accum=2 neutral 262.9, accum=8 worse 251.3).

    The remat policy FLIPS with the schedule: at flat b64,
    save_attn_mlp_qkv_kern (also keep the attention-kernel outputs so
    the backward never replays the forward kernel) lost 1.2% to
    save_attn_mlp_qkv — the 64-instance saved [inst,H,N,hd] outputs
    cost more backward HBM reads than the ~VMEM-resident recompute they
    avoid. At 4x16 the saved set is 4x smaller and the sign flips:
    qkv_kern 279.3 vs qkv 273.2 (+2.2%, same session;
    scripts/train_remat_ab.py). frozen_bf16 stays neutral (279.7) and
    off; save_attn_mlp_qkv_sig stays refuted (255.7 at accum=4)."""
    from missm_tpu.core.config import languagebind_large
    from missm_tpu.models.finetune import ModelConfig, init_model_params
    from missm_tpu.models.fusion import FusionConfig
    from missm_tpu.train.step import init_train_state, make_train_step

    towers = _apply_chunk((("image", languagebind_large("image")),), chunk)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion,
                      compute_dtype="bfloat16", remat=remat)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    if frozen_bf16:
        from missm_tpu.train.trainability import cast_frozen_params
        params = cast_frozen_params(params, cfg)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx, accum_steps=accum_steps)

    rng = np.random.default_rng(0)
    data = {
        "language": jnp.asarray(_text_ids(rng, B)),
        "image": jnp.asarray(rng.standard_normal((B, 3, 224, 224)),
                             dtype=jnp.float32),
    }
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    missing = jnp.asarray(rng.choice([0, 1, 4], B), jnp.int32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def loop(state, data, labels, missing, key):
        def body(i, carry):
            state, acc = carry
            state, m = step(state, data, labels, missing, 1e-4,
                            jax.random.fold_in(key, i))
            return (state, acc + m["loss"].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0)))
        return acc

    dt = _time_loop(loop, state, data, labels, missing, key)
    return B * iters / dt


def bench_train3(jnp, jax, iters=10, B=8,
                 remat=(("video", "save_attn_mlp_qkv"),
                        ("audio", "save_attn_mlp_kern"),
                        ("language", "save_attn_mlp")),
                 accum_steps=1, frozen_bf16=True, chunk=()):
    """Video+audio+language TRAIN step — the reference's AVE/eNTERFACE
    training workload (train_ddp.py:215-259 over MMDataset_AVE). B=8 with
    per-tower remat is the measured-best config on one 16 GB chip: at
    B=16 the saved fc1 pre-activations (24*(8B)*257*4096*2B for the video
    tower) exceed HBM and full remat measures slower (18.9 vs 19.3
    samples/s). The AUDIO tower additionally keeps its attention-kernel
    outputs (save_attn_mlp_kern — 399.0 -> 395.8 ms/step vs uniform
    save_attn_mlp); the same policy on the VIDEO tower regresses 11%
    (instance count 8x higher), and audio={False,save_most} OOM next to
    the video tower's saved activations. The VIDEO tower keeps its SPATIAL
    q/k/v too (save_attn_mlp_qkv — temporal qkv tagged 'tqkv' stays
    rematerialized): the backward skips the ln1+qkv replay, 392.8 ->
    385.5 ms/step same-session, which only fits with --frozen_bf16
    storage of the frozen partition (bit-identical under bf16 compute,
    tests/test_frozen_bf16.py). Sweep: docs/PERF.md."""
    from missm_tpu.core.config import languagebind_large
    from missm_tpu.models.finetune import ModelConfig, init_model_params
    from missm_tpu.models.fusion import FusionConfig
    from missm_tpu.train.step import init_train_state, make_train_step

    towers = _apply_chunk(
        (("video", languagebind_large("video")),
         ("audio", languagebind_large("audio"))), chunk)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "video", "audio"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion,
                      compute_dtype="bfloat16", remat=remat)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    if frozen_bf16:
        from missm_tpu.train.trainability import cast_frozen_params
        params = cast_frozen_params(params, cfg)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx, accum_steps=accum_steps)

    rng = np.random.default_rng(0)
    data = {
        "language": jnp.asarray(_text_ids(rng, B)),
        "video": jnp.asarray(rng.standard_normal((B, 3, 8, 224, 224)),
                             dtype=jnp.float32),
        "audio": jnp.asarray(rng.standard_normal((B, 3, 112, 1036)),
                             dtype=jnp.float32),
    }
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    missing = jnp.asarray(rng.choice([0, 1, 2, 3], B), jnp.int32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def loop(state, data, labels, missing, key):
        def body(i, carry):
            state, acc = carry
            state, m = step(state, data, labels, missing, 1e-4,
                            jax.random.fold_in(key, i))
            return (state, acc + m["loss"].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0)))
        return acc

    dt = _time_loop(loop, state, data, labels, missing, key)
    return B * iters / dt


def bench_eval3(jnp, jax, iters=20, B=16):
    from missm_tpu.core.config import languagebind_large
    from missm_tpu.train.step import make_eval_step

    towers = (("video", languagebind_large("video")),
              ("audio", languagebind_large("audio")))
    cfg, params, data, labels, rng = _eval_model(
        jnp, jax, towers, ("language", "video", "audio"), B,
        {"video": (B, 3, 8, 224, 224), "audio": (B, 3, 112, 1036)})
    # dropout codes over 3 modalities (full/miss-one patterns)
    masks = jnp.stack([jnp.asarray(rng.choice([0, 1, 2, 3], B), jnp.int32)
                       for _ in range(4)])
    eval_step = make_eval_step(cfg)

    @jax.jit
    def loop(params, data, labels, masks):
        def body(i, carry):
            chain, acc = carry
            out = eval_step(params, dict(data, video=chain), labels,
                            masks[i % 4])
            acc = acc + out["loss"].astype(jnp.float32)
            chain = chain + (out["loss"] * 0).astype(chain.dtype)
            return (chain, acc)
        _, acc = jax.lax.fori_loop(0, iters, body,
                                   (data["video"], jnp.float32(0)))
        return acc

    dt = _time_loop(loop, params, data, labels, masks)
    return B * iters / dt


DUTY_N_TRAIN, DUTY_BATCH = 256, 16
# tree path keyed by size: changing DUTY_N_TRAIN must not reuse a
# stale smaller tree
DUTY_TREE = f"/tmp/bench_duty_tree_{DUTY_N_TRAIN}"


def _duty_child(mode: str) -> None:
    """Child-process body for the duty-cycle measurement (run via
    `python bench.py --duty-child default|uint8`): a 2-epoch AV train
    run on a small mixed-shape real-media tree through the production
    CLI; prints one JSON line with the epoch records. Epoch 0 includes
    jit compile; epoch 1's duty is the steady-state number
    (n_batches * calibrated_device_step / epoch_wall — train/loop.py's
    meter). The BASELINE.md north star is duty > 0.9 under the
    recommended --uint8_upload pipeline (docs/MIGRATION.md)."""
    import os
    import sys
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    sys.path.insert(0, os.path.join(repo, "tests"))  # avi_writer
    import dutycycle_av_probe as dp

    if not os.path.exists(os.path.join(DUTY_TREE, "label.csv")):
        dp.build_tree(DUTY_N_TRAIN, n_valid=16, n_test=8, root=DUTY_TREE)

    from missm_tpu.cli.train import main as train_main
    argv = [
        "--datasetName", "eNTERFACE",
        "--csv_path", os.path.join(DUTY_TREE, "label.csv"),
        "--modality_types", "video", "audio",
        # MISSM_DUTY_SCALE=tiny lets the wiring smoke-test on CPU;
        # the real metric always runs at large
        "--fusion_type", "sum", "--model_scale",
        os.environ.get("MISSM_DUTY_SCALE", "large"),
        "--init", "random", "--hash_tokenizer",
        "--batch_size", str(DUTY_BATCH), "--num_epochs", "2",
        "--learning_rate", "1e-4", "--patience", "8",
        "--save_path", "/tmp/bench_duty_ckpt",
        "--log_dir", "/tmp/bench_duty_logs",
    ]
    if mode == "uint8":
        argv += ["--uint8_upload", "true"]
    _, hist = train_main(argv)
    keep = ("epoch", "duty", "step_ms", "step_dev_s", "input_s", "step_s",
            "n_batches", "wall_s")
    print("DUTY_JSON:" + json.dumps(
        [{k: e[k] for k in keep if k in e} for e in hist]))


def bench_duty() -> dict:
    """Measure the AV input-pipeline duty cycle under the default and
    --uint8_upload configs, each in a bounded child process (a tunnel
    stall during the host-decode-heavy run must not lose the round's
    primary metrics). Returns {mode: epoch_records | None} and writes
    DUTY_last.json next to this file."""
    import os
    import subprocess
    import sys

    from missm_tpu.ingest import native
    if not native.available():
        print("duty: native ingest not built, skipping", file=sys.stderr,
              flush=True)
        return {}

    out = {}
    for mode in ("default", "uint8"):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--duty-child", mode],
                capture_output=True, text=True, timeout=3000)
            rec = None
            for ln in (r.stdout or "").splitlines():
                if ln.startswith("DUTY_JSON:"):
                    rec = json.loads(ln[len("DUTY_JSON:"):])
            if rec is None:
                print(f"duty[{mode}]: no record (rc={r.returncode}): "
                      f"{(r.stdout + r.stderr)[-500:]}", file=sys.stderr,
                      flush=True)
            out[mode] = rec
        except subprocess.TimeoutExpired:
            print(f"duty[{mode}]: timed out", file=sys.stderr, flush=True)
            out[mode] = None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "DUTY_last.json")
    with open(path, "w") as f:
        json.dump({
            "note": "AV train duty cycle per bench run (VERDICT r4 #4): "
                    "2-epoch eNTERFACE-style run, mixed-shape real media "
                    f"(n_train={DUTY_N_TRAIN}, batch={DUTY_BATCH}); "
                    "epoch 1 = steady state. North star: uint8 duty > 0.9 "
                    "(BASELINE.md).",
            "configs": out}, f, indent=1)
    return out


def _retry(fn, tag, tries=3):
    """The tunneled TPU occasionally fails a readback with a transient
    FAILED_PRECONDITION (e.g. after an earlier interrupted execution left
    the chip mid-program); retry rather than lose the round's number."""
    import sys
    for i in range(tries):
        try:
            return fn()
        except Exception as e:  # jax runtime errors share no useful base
            if i == tries - 1:
                raise
            print(f"{tag}: retry {i + 1} after {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            time.sleep(10)


def _await_backend(max_tries=5, delay=60, probe_timeout=240):
    """Wait out a tunnel outage before touching jax in this process.
    Backend init through the tunnel can raise UNAVAILABLE or hang in C++
    (uninterruptible by Python signals), and a failed init is cached for
    the life of the process — so probe `jax.device_count()` in a CHILD
    process that a timeout can always kill, and only proceed once a probe
    succeeds. Keeps a transient outage at round end from zeroing the
    round's BENCH artifact."""
    import subprocess
    import sys

    for attempt in range(max_tries):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.device_count()"],
                timeout=probe_timeout, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return
        except Exception as e:
            if attempt == max_tries - 1:
                raise RuntimeError(
                    f"TPU backend unavailable after {max_tries} probe "
                    f"attempts: {type(e).__name__}: {e}")
            print(f"backend probe failed ({type(e).__name__}); "
                  f"retry {attempt + 1}/{max_tries} in {delay}s",
                  file=sys.stderr, flush=True)
            time.sleep(delay)


def main():
    _await_backend()

    import jax
    import jax.numpy as jnp

    from missm_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import sys
    n = jax.device_count()
    ev = _retry(lambda: bench_eval(jnp, jax), "eval") / n
    print(f"eval: {ev:.2f}", file=sys.stderr, flush=True)
    tr = _retry(lambda: bench_train(jnp, jax), "train") / n
    print(f"train: {tr:.2f}", file=sys.stderr, flush=True)
    e3 = _retry(lambda: bench_eval3(jnp, jax), "eval3") / n
    print(f"eval3: {e3:.2f}", file=sys.stderr, flush=True)
    t3 = _retry(lambda: bench_train3(jnp, jax), "train3") / n
    print(f"train3: {t3:.2f}", file=sys.stderr, flush=True)

    duty_metrics = []
    try:
        duty = bench_duty()
    except Exception as e:  # never lose the primary metrics to the meter
        print(f"duty: skipped after {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        duty = {}
    for mode, rec in duty.items():
        if rec and len(rec) > 1 and rec[-1].get("duty") is not None:
            d = rec[-1]["duty"]
            print(f"duty[{mode}]: {d:.3f}", file=sys.stderr, flush=True)
            duty_metrics.append({
                "metric": f"train_av_duty_cycle_{mode}",
                "value": round(d, 3), "unit": "fraction",
                # north star: >0.9 TPU duty (BASELINE.md / SURVEY §6)
                "vs_baseline": round(d / 0.9, 3)})

    print(json.dumps({
        "metric": "eval_samples_per_sec_per_chip",
        "value": round(ev, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(ev / A100_EVAL_IMAGE_TEXT, 3),
        "extra_metrics": [
            {"metric": "train_samples_per_sec_per_chip",
             "value": round(tr, 2), "unit": "samples/s/chip",
             "vs_baseline": round(tr / A100_TRAIN_IMAGE_TEXT, 3)},
            {"metric": "eval3_video_audio_language_samples_per_sec_per_chip",
             "value": round(e3, 2), "unit": "samples/s/chip",
             "vs_baseline": round(e3 / A100_EVAL_THREE_TOWER, 3)},
            {"metric": "train3_video_audio_language_samples_per_sec_per_chip",
             "value": round(t3, 2), "unit": "samples/s/chip",
             "vs_baseline": round(t3 / A100_TRAIN_THREE_TOWER, 3)},
        ] + duty_metrics,
    }))


if __name__ == "__main__":
    import sys as _sys
    if len(_sys.argv) > 2 and _sys.argv[1] == "--duty-child":
        _duty_child(_sys.argv[2])
    else:
        main()
