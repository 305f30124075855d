"""Pipeline parallelism (GPipe schedule) over the scanned transformer stack.

Not in the reference (its only strategy is DDP data parallelism,
train_ddp.py:145,189) — this is a TPU-native scaling extra: the [L, ...]
stacked block params are sharded over a `pipe` mesh axis (each stage holds
L/S contiguous layers AND their optimizer state), activations stream
through the stages as microbatches over ICI `ppermute`s. Use it when the
tower's depth (params + per-layer activations) outgrows one chip's HBM:
unlike FSDP, no weight all-gathers are paid per step — only the [mb, N, D]
activation hop per stage boundary.

Design (idiomatic JAX, "How to Scale Your Model" pipelining recipe):
- `jax.shard_map` manual over ONLY the pipe axis (`axis_names={'pipe'}`);
  the data/model axes stay auto, so GSPMD data parallelism and Megatron-TP
  sharding propagate through the pipelined region unchanged (a pipelined
  step composes with --mesh_model and --fsdp).
- classic GPipe: M microbatches, M + S - 1 ticks; at tick t stage r runs
  microbatch (t - r) through its local `lax.scan` over L/S layers, then
  `ppermute`s the activation to stage r + 1. Bubble fraction =
  (S - 1) / (M + S - 1).
- the last stage's outputs are broadcast to every stage with a masked
  `psum`, so everything downstream (pooling, fusion, loss) stays replicated
  over pipe and bitwise-identical to the unpipelined graph.
- fully differentiable (scan + ppermute + psum transpose cleanly); block
  grads come back sharded P('pipe') on the layer axis — exactly the layout
  the stage-local Adam state wants.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.mesh import PIPE_AXIS


@jax.custom_vjp
def _enter_pipe(x):
    """Invariant -> varying boundary for pipe-replicated inputs (the
    microbatched activations and their batch-aligned extras).

    Forward is a free pcast. The backward psum (every stage contributes
    its cotangent for the replicated input) runs in f32: sums over up to
    n_pipe stages accumulate at full precision, and no 16-bit all-reduce
    is emitted — XLA CPU's AllReducePromotion pass CHECK-crashes cloning
    the bf16 psum_invariant that autodiff's `where` transpose otherwise
    creates inside the scheduling loop ("Invalid binary instruction
    opcode copy"), which would abort every bf16 CPU test/compile."""
    return jax.lax.pcast(x, (PIPE_AXIS,), to="varying")


def _enter_pipe_fwd(x):
    return _enter_pipe(x), None


def _enter_pipe_bwd(_, g):
    gx = jax.lax.psum(g.astype(jnp.float32), PIPE_AXIS)
    return (gx.astype(g.dtype),)


_enter_pipe.defvjp(_enter_pipe_fwd, _enter_pipe_bwd)


@dataclasses.dataclass(frozen=True)
class PipeConfig:
    """Static pipeline spec. Hashable (Mesh is hashable), so ModelConfig
    can carry it into jit closures.

    microbatches = 0 means `n_pipe` (the minimum that keeps every stage
    busy in steady state); larger values shrink the bubble at the cost of
    smaller per-microbatch shapes."""
    mesh: Mesh
    n_pipe: int
    microbatches: int = 0

    @property
    def m(self) -> int:
        return self.microbatches or self.n_pipe


def pipeline_blocks(pipe: PipeConfig, blocks, x, extras=(), *, group: int = 1,
                    block_fn):
    """Run `block_fn` (the local layer scan) over `blocks` [L, ...] with a
    GPipe schedule across the mesh's pipe axis.

    x: [B_rows, ...] activations (B_rows = B*T for temporal towers).
    extras: batch-aligned arrays (e.g. the text key bias) split into
        microbatches alongside x.
    group: rows that must stay in one microbatch (the frame count T for
        temporal towers, whose block reshapes assume whole videos).
    block_fn(blocks_local, x_mb, *extras_mb) -> y_mb.
    """
    S = pipe.n_pipe
    M = pipe.m
    L = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    if L % S:
        raise ValueError(f"{L} layers not divisible by pipe axis {S}")
    rows = x.shape[0]
    if rows % (M * group):
        raise ValueError(
            f"batch rows {rows} not divisible into {M} microbatches of "
            f"whole {group}-row groups (pipe_microbatches must divide the "
            f"per-call batch)")

    def inner(blocks_local, x_full, *extras_full):
        r = jax.lax.axis_index(PIPE_AXIS)
        mb = x_full.shape[0] // M

        def split(a):
            return a.reshape((M, a.shape[0] // M) + a.shape[1:])

        x_mb = _enter_pipe(split(x_full))
        ex_mb = tuple(_enter_pipe(split(e)) for e in extras_full)

        def tick(carry, t):
            recv, outs = carry
            # stage r processes microbatch (t - r); stage 0 feeds from x,
            # later stages from the previous stage's ppermute.
            inp = jnp.where(r == 0, jax.lax.dynamic_index_in_dim(
                x_mb, jnp.minimum(t, M - 1), 0, keepdims=False), recv)
            midx = jnp.clip(t - r, 0, M - 1)
            ex = tuple(jax.lax.dynamic_index_in_dim(e, midx, 0,
                                                    keepdims=False)
                       for e in ex_mb)
            out = block_fn(blocks_local, inp, *ex)
            recv_next = jax.lax.ppermute(
                out, PIPE_AXIS, [(i, (i + 1) % S) for i in range(S)])
            # bubble ticks (t < S-1) write garbage at index 0, which the
            # real microbatch 0 overwrites at t = S-1 (oidx is
            # non-decreasing), so no masking copy is needed.
            oidx = jnp.clip(t - (S - 1), 0, M - 1)
            outs = jax.lax.dynamic_update_index_in_dim(outs, out, oidx, 0)
            return (recv_next, outs), None

        init = jax.lax.pcast(
            (jnp.zeros((mb,) + x_full.shape[1:], x_full.dtype),
             jnp.zeros((M, mb) + x_full.shape[1:], x_full.dtype)),
            (PIPE_AXIS,), to="varying")
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # outputs are only real on the last stage; broadcast to all stages
        outs = jnp.where(r == S - 1, outs, jnp.zeros_like(outs))
        if jax.default_backend() == "cpu" and outs.dtype != jnp.float32:
            # XLA CPU's AllReducePromotion CHECK-crashes on 16-bit
            # all-reduces whose cloned reduction grew a copy root (see
            # _enter_pipe). The f32 detour is bitwise-identical here: the
            # sum is one real value + (S-1) zeros per element.
            outs = jax.lax.psum(outs.astype(jnp.float32), PIPE_AXIS)
            outs = outs.astype(x_full.dtype)
        else:
            outs = jax.lax.psum(outs, PIPE_AXIS)
        return outs.reshape(x_full.shape)

    in_specs = (P(PIPE_AXIS), P()) + (P(),) * len(extras)
    return jax.shard_map(inner, mesh=pipe.mesh, in_specs=in_specs,
                         out_specs=P(), axis_names={PIPE_AXIS})(
        blocks, x, *extras)
