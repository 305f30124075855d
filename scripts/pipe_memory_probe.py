"""Live-activation comparison: gpipe vs 1f1b pipeline schedules.

Compiles grad-of-sum through pipeline_blocks on a 16-layer, d=512 block
stack (rows=64, N=128 tokens, S=2 stages, M=4 microbatches) on the
8-virtual-device CPU backend, and reads XLA's buffer-assignment peak
(`compiled.memory_analysis()`: temp_size = activations/workspace,
excluding arguments/outputs) for each (schedule, remat) combination,
next to the analytic residual accounting:

  gpipe + remat:  scan-of-ticks saves each tick's block-scan carries ->
                  ~(M ticks) x (L/S layer inputs) x [mb, N, D] per stage
                  = (L/S) x rows x N x D floats
  gpipe no remat: all block internals (qkv/scores/mlp_wide) on top
  1f1b (any):     the custom VJP saves ONLY stage inputs [M, mb, N, D]
                  = rows x N x D floats -> L/S times less than
                  gpipe+remat, policy-independent

Run: python scripts/pipe_memory_probe.py  (CPU, no TPU needed)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from missm_tpu.core.mesh import make_mesh
from missm_tpu.parallel import PipeConfig
from missm_tpu.parallel.pipeline import pipeline_blocks

L, D, N, ROWS = 16, 512, 128, 64
HEADS = 8
S, M = 2, 4


def make_block_fn(remat):
    def block(p, h):
        # pre-LN attention + MLP, enough structure to make residual
        # policies matter (qkv + scores + mlp_wide internals)
        hn = (h - h.mean(-1, keepdims=True)) / jnp.sqrt(
            h.var(-1, keepdims=True) + 1e-5)
        qkv = hn @ p["wqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(t.shape[0], N, HEADS, D // HEADS)

        q, k, v = heads(q), heads(k), heads(v)
        s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(D // HEADS)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(h.shape)
        h = h + o @ p["wo"]
        hn = (h - h.mean(-1, keepdims=True)) / jnp.sqrt(
            h.var(-1, keepdims=True) + 1e-5)
        wide = jax.nn.gelu(hn @ p["w1"])
        return h + wide @ p["w2"]

    if remat:
        block = jax.checkpoint(block)

    def block_fn(blocks_local, h):
        def body(h, p):
            return block(p, h), None
        h, _ = jax.lax.scan(body, h, blocks_local)
        return h

    return block_fn


def params(rng):
    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.02, jnp.float32)
    return {"wqkv": w(L, D, 3 * D), "wo": w(L, D, D),
            "w1": w(L, D, 4 * D), "w2": w(L, 4 * D, D)}


def main():
    mesh = make_mesh(n_data=8 // S, n_model=1, n_pipe=S)
    rng = np.random.default_rng(0)
    blocks = params(rng)
    x = jnp.asarray(rng.standard_normal((ROWS, N, D)), jnp.float32)

    results = {}
    for schedule in ("gpipe", "1f1b"):
        for remat in (False, True):
            pipe = PipeConfig(mesh, n_pipe=S, microbatches=M,
                              schedule=schedule)
            bf = make_block_fn(remat)

            def loss(blocks, x):
                y = pipeline_blocks(pipe, blocks, x, block_fn=bf)
                return jnp.sum(y * y)

            c = jax.jit(jax.grad(loss)).lower(blocks, x).compile()
            ma = c.memory_analysis()
            temp = getattr(ma, "temp_size_in_bytes", None)
            results[(schedule, remat)] = temp
            print(f"{schedule:6s} remat={remat!s:5s} "
                  f"temp={temp / 1e6 if temp else float('nan'):9.1f} MB "
                  f"(out {getattr(ma, 'output_size_in_bytes', 0) / 1e6:.1f} "
                  f"MB, args {getattr(ma, 'argument_size_in_bytes', 0) / 1e6:.1f} MB)",
                  flush=True)

    ana_stage_inputs = ROWS * N * D * 4 / 1e6
    print(f"\nanalytic: stage inputs [M,mb,N,D] = {ana_stage_inputs:.1f} MB; "
          f"gpipe+remat layer-input residuals ~ (L/S)x = "
          f"{L // S * ana_stage_inputs:.1f} MB")
    for r in (False, True):
        g, o = results[("gpipe", r)], results[("1f1b", r)]
        if g and o:
            print(f"remat={r}: 1f1b temp is {g / o:.2f}x smaller than gpipe")


if __name__ == "__main__":
    main()
