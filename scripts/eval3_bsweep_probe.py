"""eval3 batch-size sweep (VERDICT r3 task 8).

The image-eval b-sweep (scripts/b128_chunk_probe.py) root-caused the
64-instance composed-block scheduling optimum; eval3's B=16 (= 128 video
instances after the 8-frame expansion, i.e. two 64-instance chunks) was
asserted from that result, never swept. This runs bench.py's own eval3
workload at B in {8, 16, 32} with the bench methodology (in-jit
fori_loop, loss-chained, min-of-3) and reports samples/s/chip.

Instance arithmetic per B: video B*8 spatial instances + audio B
593-token instances; chunking splits >64-instance video batches.

Run: python scripts/eval3_bsweep_probe.py [B ...]
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

    bs = [int(b) for b in sys.argv[1:]] or [8, 16, 32]
    results = {}
    for B in bs:
        sps = min_of = None
        for _ in range(3):
            r = bench.bench_eval3(jnp, jax, iters=10, B=B)
            min_of = r if min_of is None else max(min_of, r)
        sps = min_of
        results[B] = sps
        print(f"B={B:3d}: {sps:7.2f} samples/s/chip "
              f"({B * 1e3 / sps:.1f} ms/step, video instances {B * 8})",
              flush=True)
    best = max(results, key=results.get)
    print(f"best: B={best} ({results[best]:.2f} samples/s/chip)")


if __name__ == "__main__":
    main()
