"""A/B the image-tower train step across remat policies with bench.py's
own in-jit methodology (one jitted fori_loop, min-of-3 timed calls).

Run: python scripts/train_remat_ab.py [policy[:frozen][@accum] ...]

`@N` pins accum_steps (default: bench_train's default, 4 since round 4);
`@1` reproduces the flat-b64 r2/r3 tables in docs/PERF.md. `:frozen`
A/Bs --frozen_bf16 param storage.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from missm_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import bench

    policies = sys.argv[1:] or ["save_attn_mlp", "save_attn_mlp_qkv"]
    for pol in policies:
        # "policy@N" suffix pins accum_steps (N=1 reproduces the flat
        # r2/r3 tables; default = bench_train's, 4 since round 4)
        pol, _, accum = pol.partition("@")
        kw = {"accum_steps": int(accum)} if accum else {}
        # "policy:frozen" suffix A/Bs --frozen_bf16 param storage too
        pol, _, flag = pol.partition(":")
        if flag not in ("", "frozen", "frozen_bf16"):
            raise SystemExit(f"unknown suffix ':{flag}' (use ':frozen')")
        fb16 = bool(flag)
        # pol itself is validated inside _block_forward (unknown policy
        # strings raise instead of silently measuring full remat)
        r = bench.bench_train(jnp, jax, remat=pol, frozen_bf16=fb16, **kw)
        tag = f"remat={pol}" + (" +frozen_bf16" if fb16 else "")
        if accum:
            tag += f" accum={accum}"
        print(f"train b64 {tag}: {r:.1f} samples/s/chip", flush=True)


if __name__ == "__main__":
    main()
