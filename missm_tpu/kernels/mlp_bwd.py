"""Fused MLP-backward dx kernel (round-5 go/no-go spike, VERDICT r4 #3).

The composed ViT-L backward runs ~34% utilization on its executed FLOPs
(docs/PERF.md "FLOP-accounted MFU") and survived seven XLA-level
scheduling levers in round 4. The one unexplored class is hand-scheduled
Pallas for the composed pieces — the move that won the forward attention
23%. This kernel fuses the MLP dx chain of one pre-LN block backward

    dh = ((dy @ W2^T) * quick_gelu'(wide)) @ W1^T

into ONE kernel with the [bm, bf] dwide intermediate staged in VMEM:
the XLA path materializes dwide [M, FF] (~134 MB bf16 at the b64 image
shapes) to HBM between the two matmuls, plus a separate elementwise
pass for the activation derivative. The spatial MLP carries no LoRA
(reference peft targets are attention-only, image/modeling_image.py:
775-783) and its base weights are frozen, so dx is the ONLY cotangent
this chain owes — dW1/dW2 are dead-coded by the trainable partition.

quick_gelu'(x) = s * (1 + 1.702 x (1 - s)), s = sigmoid(1.702 x) —
matches ops.basic.quick_gelu's forward exactly.

Grid: (M/bm token blocks, FF/bf feature blocks), feature-minor; a f32
[bm, D] accumulator lives in VMEM scratch across the feature steps and
is flushed to the output block once per token block. Defaults bm=256
bf=512: Pallas double-buffers every I/O block, so the VMEM bill is
2*(dy .5 + wide .25 + w1 1 + w2 1 + out .5) + acc 1 = ~7.5 MB — the
first attempt (512, 1024) billed 17.93 MB and was rejected by the
16 MB scoped-vmem limit. The second matmul
feeds the MXU bf16 operands (dwide rounded once, exactly like the XLA
path's bf16 materialization of dwide).

Measured A/B vs the XLA chain: scripts/mlp_bwd_probe.py; verdict in
docs/PERF.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(dy_ref, wide_ref, w1_ref, w2_ref, o_ref, acc_ref):
    f = pl.program_id(1)
    nf = pl.num_programs(1)

    @pl.when(f == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # dwide block [bm, bf] = dy [bm, D] @ W2[f-block]^T  (contract D)
    dwide = jax.lax.dot_general(
        dy_ref[:], w2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    x = wide_ref[:].astype(jnp.float32)
    s = jax.nn.sigmoid(1.702 * x)
    dwide = dwide * (s * (1.0 + 1.702 * x * (1.0 - s)))
    # acc [bm, D] += dwide @ W1[:, f-block]^T  (contract bf)
    acc_ref[:] += jax.lax.dot_general(
        dwide.astype(dy_ref.dtype), w1_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(f == nf - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bf", "interpret"))
def mlp_bwd_dx(dy, wide, w1, w2, *, bm: int = 256, bf: int = 512,
               interpret: bool = False):
    """dh for the quick_gelu MLP chain, fused.

    dy:   [M, D]  cotangent at the MLP output (fc2 output)
    wide: [M, FF] saved fc1 pre-activation ('mlp_wide')
    w1:   [D, FF] fc1 weight (in, out)
    w2:   [FF, D] fc2 weight (in, out)
    -> dh [M, D] in dy.dtype (cotangent at the MLP input, pre-ln2-bwd)
    """
    M, D = dy.shape
    FF = wide.shape[1]
    assert w1.shape == (D, FF) and w2.shape == (FF, D), (w1.shape, w2.shape)
    gm, gf = pl.cdiv(M, bm), pl.cdiv(FF, bf)
    return pl.pallas_call(
        _kernel,
        grid=(gm, gf),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i, f: (i, 0),
                         memory_space=pltpu.VMEM),           # dy
            pl.BlockSpec((bm, bf), lambda i, f: (i, f),
                         memory_space=pltpu.VMEM),           # wide
            pl.BlockSpec((D, bf), lambda i, f: (0, f),
                         memory_space=pltpu.VMEM),           # w1 cols
            pl.BlockSpec((bf, D), lambda i, f: (f, 0),
                         memory_space=pltpu.VMEM),           # w2 rows
        ],
        out_specs=pl.BlockSpec((bm, D), lambda i, f: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), dy.dtype),
        scratch_shapes=[pltpu.VMEM((bm, D), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * M * D * FF,
            bytes_accessed=2 * (M * D * 2 + M * FF + D * FF * 2),
            transcendentals=M * FF),
        interpret=interpret,
    )(dy, wide, w1, w2)


def mlp_bwd_dx_xla(dy, wide, w1, w2):
    """The un-fused reference chain (what XLA builds from autodiff):
    dwide materialized between the two matmuls."""
    dwide = jax.lax.dot_general(
        dy, w2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    x = wide.astype(jnp.float32)
    s = jax.nn.sigmoid(1.702 * x)
    dwide = dwide * (s * (1.0 + 1.702 * x * (1.0 - s)))
    out = jax.lax.dot_general(
        dwide.astype(dy.dtype), w1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.astype(dy.dtype)
