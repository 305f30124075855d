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
    smaller per-microbatch shapes.

    schedule: 'gpipe' (autodiff through the forward schedule — saves
    every tick's residuals, so live activations scale with M·L/S per
    stage) or '1f1b' (memory-capped backward: only the M per-stage INPUT
    activations are saved; the backward is a hand-scheduled reverse
    pipeline that recomputes one microbatch at a time — live residuals
    per stage drop from ~(L/S)·B rows to ~B rows, the cap 1F1B exists
    for). Same bubble, same math; see pipeline_blocks."""
    mesh: Mesh
    n_pipe: int
    microbatches: int = 0
    schedule: str = "gpipe"

    @property
    def m(self) -> int:
        return self.microbatches or self.n_pipe


def _psum_pipe(x):
    """psum over the pipe axis, with the f32 detour XLA:CPU needs: its
    AllReducePromotion pass CHECK-crashes on 16-bit all-reduces whose
    cloned reduction grew a copy root (see _enter_pipe). The detour is
    bitwise-identical where the summands are one real value + zeros."""
    if jax.default_backend() == "cpu" and x.dtype != jnp.float32:
        return jax.lax.psum(x.astype(jnp.float32), PIPE_AXIS).astype(x.dtype)
    return jax.lax.psum(x, PIPE_AXIS)


def pipeline_blocks(pipe: PipeConfig, blocks, x, extras=(), *, group: int = 1,
                    block_fn):
    """Run `block_fn` (the local layer scan) over `blocks` [L, ...] with a
    pipeline schedule across the mesh's pipe axis.

    x: [B_rows, ...] activations (B_rows = B*T for temporal towers).
    extras: batch-aligned arrays (e.g. the text key bias) split into
        microbatches alongside x.
    group: rows that must stay in one microbatch (the frame count T for
        temporal towers, whose block reshapes assume whole videos).
    block_fn(blocks_local, x_mb, *extras_mb) -> y_mb.

    pipe.schedule picks 'gpipe' (autodiff through the schedule) or
    '1f1b' (memory-capped custom-VJP backward, _pipeline_1f1b).
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
    if pipe.schedule == "1f1b":
        return _pipeline_1f1b(pipe, blocks, x, tuple(extras),
                              block_fn=block_fn)
    if pipe.schedule != "gpipe":
        raise ValueError(f"unknown pipe schedule {pipe.schedule!r}; "
                         f"expected 'gpipe' or '1f1b'")

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
        outs = _psum_pipe(outs)
        return outs.reshape(x_full.shape)

    in_specs = (P(PIPE_AXIS), P()) + (P(),) * len(extras)
    return jax.shard_map(inner, mesh=pipe.mesh, in_specs=in_specs,
                         out_specs=P(), axis_names={PIPE_AXIS})(
        blocks, x, *extras)


def _pipeline_1f1b(pipe: PipeConfig, blocks, x, extras, *, block_fn):
    """Memory-capped pipeline schedule (`--pipe_schedule 1f1b`).

    GPipe-through-autodiff saves every tick's residuals: per stage,
    ~M microbatches x (L/S) layer inputs (under full block remat; far
    more without it) stay live until the backward — the very
    depth-memory problem pipelining is meant to solve. Classic 1F1B
    interleaves each microbatch's backward right after its forward to
    cap live activations at ~S microbatches. In this model family the
    loss is a full-batch function DOWNSTREAM of the pipelined stack
    (pooling + fusion over all M microbatches), so cotangents for every
    microbatch arrive together and fwd/bwd ticks cannot interleave —
    but the memory cap 1F1B exists for is reachable anyway:

    - forward (custom-VJP primal): the GPipe tick schedule, additionally
      recording each stage's INPUT microbatches ([M, mb, ...] per stage
      — the only activations that survive the forward).
    - backward: a hand-scheduled REVERSE pipeline. At tick t, stage r
      takes the cotangent for microbatch m = t-(S-1-r) (from downstream
      at the last stage, from stage r+1's ppermute elsewhere),
      recomputes its local layers from the saved stage input via
      jax.vjp (one microbatch live at a time, the 1F1B property), and
      sends the input-cotangent upstream. Bubble ticks contribute
      masked zeros; block grads come back sharded P('pipe') exactly as
      the gpipe path's.

    Live residuals per stage: [M, mb, rows...] = one batch of stage
    inputs, vs gpipe's ~(L/S)x that. FLOPs: one extra stage forward per
    microbatch — identical to gpipe under remat=True block policies
    (whose backward replays the same layers from the same inputs).
    Math: same per-layer computation, same f32 cotangent reductions —
    pinned identical to DP/gpipe by tests/test_pipeline.py."""
    S = pipe.n_pipe
    M = pipe.m
    mesh = pipe.mesh
    n_ex = len(extras)

    def split(a):
        return a.reshape((M, a.shape[0] // M) + a.shape[1:])

    def _vary(t):
        return jax.lax.pcast(t, (PIPE_AXIS,), to="varying")

    def inner_fwd(blocks_local, x_full, *extras_full):
        r = jax.lax.axis_index(PIPE_AXIS)
        mb = x_full.shape[0] // M
        x_mb = _vary(split(x_full))
        ex_mb = tuple(_vary(split(e)) for e in extras_full)
        # slot M is the garbage bin for bubble-tick writes; the backward
        # reads ins[:M] only
        ins0 = _vary(jnp.zeros((M + 1, mb) + x_full.shape[1:],
                               x_full.dtype))

        def tick(carry, t):
            recv, outs, ins = carry
            inp = jnp.where(r == 0, jax.lax.dynamic_index_in_dim(
                x_mb, jnp.minimum(t, M - 1), 0, keepdims=False), recv)
            m = t - r
            slot = jnp.where((m >= 0) & (m <= M - 1), jnp.clip(m, 0, M - 1),
                             M)
            ins = jax.lax.dynamic_update_index_in_dim(ins, inp, slot, 0)
            midx = jnp.clip(m, 0, M - 1)
            ex = tuple(jax.lax.dynamic_index_in_dim(e, midx, 0,
                                                    keepdims=False)
                       for e in ex_mb)
            out = block_fn(blocks_local, inp, *ex)
            recv_next = jax.lax.ppermute(
                out, PIPE_AXIS, [(i, (i + 1) % S) for i in range(S)])
            oidx = jnp.clip(t - (S - 1), 0, M - 1)
            outs = jax.lax.dynamic_update_index_in_dim(outs, out, oidx, 0)
            return (recv_next, outs, ins), None

        init = (_vary(jnp.zeros((mb,) + x_full.shape[1:], x_full.dtype)),
                _vary(jnp.zeros((M, mb) + x_full.shape[1:], x_full.dtype)),
                ins0)
        (_, outs, ins), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        outs = jnp.where(r == S - 1, outs, jnp.zeros_like(outs))
        y = _psum_pipe(outs).reshape(x_full.shape)
        return y, ins

    def inner_bwd(blocks_local, ins, dy_full, *extras_full):
        r = jax.lax.axis_index(PIPE_AXIS)
        mb = dy_full.shape[0] // M
        dy_mb = _vary(split(dy_full).astype(ins.dtype))
        ex_mb = tuple(_vary(split(e)) for e in extras_full)

        def block_call(b, xx, *ee):
            return block_fn(b, xx, *ee)

        def tick(carry, t):
            recv, db_acc, dx_buf, dex_bufs = carry
            m = t - (S - 1 - r)
            valid = (m >= 0) & (m <= M - 1)
            mi = jnp.clip(m, 0, M - 1)
            g = jnp.where(r == S - 1, jax.lax.dynamic_index_in_dim(
                dy_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False), recv)
            inp = jax.lax.dynamic_index_in_dim(ins, mi, 0, keepdims=False)
            ee = tuple(jax.lax.dynamic_index_in_dim(e, mi, 0,
                                                    keepdims=False)
                       for e in ex_mb)
            _, vjp_fn = jax.vjp(block_call, blocks_local, inp, *ee)
            db, dxm, *dee = vjp_fn(g)
            db_acc = jax.tree_util.tree_map(
                lambda a, d: a + jnp.where(valid, d, jnp.zeros_like(d)),
                db_acc, db)
            slot = jnp.where(valid, mi, M)
            dx_buf = jax.lax.dynamic_update_index_in_dim(dx_buf, dxm, slot,
                                                         0)
            dex_bufs = tuple(
                jax.lax.dynamic_update_index_in_dim(a, d, slot, 0)
                for a, d in zip(dex_bufs, dee))
            send = jax.lax.ppermute(
                dxm, PIPE_AXIS, [(i, (i - 1) % S) for i in range(S)])
            return (send, db_acc, dx_buf, dex_bufs), None

        init = (_vary(jnp.zeros((mb,) + ins.shape[2:], ins.dtype)),
                jax.tree_util.tree_map(jnp.zeros_like, blocks_local),
                jnp.zeros_like(ins),  # already varying (ins is sharded in)
                tuple(_vary(jnp.zeros((M + 1,) + e.shape[1:], e.dtype))
                      for e in ex_mb))
        (_, db, dx_buf, dex_bufs), _ = jax.lax.scan(
            tick, init, jnp.arange(M + S - 1))
        # dx is real only on stage 0 (one value + zeros -> _psum_pipe's
        # premise holds); per-extra cotangents are a GENUINE S-term sum
        # (the extras feed every stage's layers), so accumulate in f32
        # unconditionally — matching the gpipe path's _enter_pipe_bwd
        # precision, not just XLA:CPU's crash workaround
        dx = _psum_pipe(jnp.where(r == 0, dx_buf[:M],
                                  jnp.zeros_like(dx_buf[:M])))
        dx = dx.reshape((dx.shape[0] * dx.shape[1],) + dx.shape[2:])
        dex = tuple(
            jax.lax.psum(a[:M].astype(jnp.float32), PIPE_AXIS)
            .astype(a.dtype)
            .reshape((M * a.shape[1],) + a.shape[2:])
            for a in dex_bufs)
        return (db, dx) + dex

    @jax.custom_vjp
    def call(blocks, x, extras):
        y, _ = jax.shard_map(
            inner_fwd, mesh=mesh,
            in_specs=(P(PIPE_AXIS), P()) + (P(),) * n_ex,
            out_specs=(P(), P(PIPE_AXIS)), axis_names={PIPE_AXIS})(
            blocks, x, *extras)
        return y

    def call_fwd(blocks, x, extras):
        y, ins = jax.shard_map(
            inner_fwd, mesh=mesh,
            in_specs=(P(PIPE_AXIS), P()) + (P(),) * n_ex,
            out_specs=(P(), P(PIPE_AXIS)), axis_names={PIPE_AXIS})(
            blocks, x, *extras)
        return y, (blocks, ins, extras)

    def call_bwd(res, dy):
        blocks_saved, ins, extras_saved = res
        out = jax.shard_map(
            inner_bwd, mesh=mesh,
            in_specs=(P(PIPE_AXIS), P(PIPE_AXIS), P()) + (P(),) * n_ex,
            out_specs=(P(PIPE_AXIS), P()) + (P(),) * n_ex,
            axis_names={PIPE_AXIS})(blocks_saved, ins, dy, *extras_saved)
        db, dx = out[0], out[1]
        return db, dx, tuple(out[2:])

    call.defvjp(call_fwd, call_bwd)
    return call(blocks, x, tuple(extras))
