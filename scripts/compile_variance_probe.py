"""Diagnose the `--remat save_attn` compile stall (VERDICT r1 weak #7).

Hypothesis under test: the >20-min compile observed once in round 1 is
tunnel/compile-service variance, not a save_attn-specific XLA pathology.
Method: compile the SAME ViT-L train step repeatedly in fresh processes
(persistent cache disabled) for remat policies {True, save_attn} and
record wall times. A policy-specific pathology reproduces per-policy;
service variance shows up as occasional outliers uncorrelated with the
policy (this session: the identical bwd kernel compiled in 243 s in one
process and 33 s in another, minutes apart).

Usage: python scripts/compile_variance_probe.py [reps]
Child mode (internal): ... --child <policy>
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(policy):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from missm_tpu.core.config import languagebind_large
    from missm_tpu.models.finetune import ModelConfig, init_model_params
    from missm_tpu.models.fusion import FusionConfig
    from missm_tpu.train.step import init_train_state, make_train_step

    remat = True if policy == "True" else policy
    towers = (("image", languagebind_large("image")),)
    fusion = FusionConfig(fusion_type="sum",
                          modality_types=("language", "image"),
                          output_dims=10, feature_dims=768, fusion_dim=256)
    cfg = ModelConfig(towers=towers, fusion=fusion,
                      compute_dtype="bfloat16", remat=remat)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    state, tx = init_train_state(params, cfg)
    step = make_train_step(cfg, tx)

    B = 64
    rng = np.random.default_rng(0)
    ids = np.full((B, 77), 49407, np.int32)
    ids[:, 0] = 49406
    data = {"language": jnp.asarray(ids),
            "image": jnp.asarray(rng.standard_normal((B, 3, 224, 224)),
                                 dtype=jnp.float32)}
    labels = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    missing = jnp.asarray(rng.choice([0, 1, 4], B), jnp.int32)

    t0 = time.perf_counter()
    state, m = step(state, data, labels, missing, 1e-4, jax.random.PRNGKey(1))
    float(m["loss"])
    print(f"COMPILE {policy} {time.perf_counter() - t0:.1f}s", flush=True)


def main():
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
        return
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    env = dict(os.environ, MISSM_NO_COMPILE_CACHE="1")
    for rep in range(reps):
        for policy in ("True", "save_attn"):
            t0 = time.perf_counter()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 policy],
                capture_output=True, text=True, env=env, timeout=2400)
            line = [l for l in r.stdout.splitlines() if "COMPILE" in l]
            print(f"rep {rep} {policy}: "
                  f"{line[0] if line else 'FAILED: ' + r.stderr[-300:]} "
                  f"(proc total {time.perf_counter() - t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
