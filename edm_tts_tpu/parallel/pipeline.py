"""Pipeline parallelism: a GPipe-style executor over a ``pipe`` mesh axis.

The reference has no pipeline story at all (single-node 8-process DDP,
/root/reference/configs/acc_cfg.yaml); its largest model (the 464M s2a
injection conformer) fits one device. This module is the TPU pod-scale
extension for when depth outgrows a chip: split a stack of identical
blocks into S stages, one per device along a ``pipe`` mesh axis, and
stream M microbatches through the stages with ``lax.ppermute`` hops —
the classical GPipe schedule with an (S-1)/(M+S-1) bubble.

TPU-first design choices:
- ``shard_map`` over the ``pipe`` axis: every device runs the SAME traced
  program (no per-stage Python), so XLA compiles one SPMD executable and
  the inter-stage hop is a single ICI ``CollectivePermute``.
- The tick loop is a ``lax.scan`` (static trip count M+S-1), so the whole
  pipeline — all stages, all microbatches — is ONE compiled program, and
  ``jax.grad`` through it runs the reverse schedule automatically
  (the transpose of ppermute is the reverse ppermute).
- Stage weights live as a stacked (S, ...) pytree sharded on the leading
  dim: each device holds exactly its stage's slice in HBM.

Composability: the ``pipe`` axis is independent of the (data, fsdp, model)
axes in ``parallel/mesh.py`` — a 4-D mesh runs dp x ZeRO x tp x pp; the
numerics tests pin pp against the sequential stack.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"

Pytree = Any


def make_pipe_mesh(
    n_pipe: int, n_data: int = 1, n_model: int = 1, devices=None
) -> Mesh:
    """(pipe[, data][, model]) mesh. ``pipe`` is the outer axis: one stage's
    devices (its data-parallel replicas / tensor-parallel shards) sit on
    adjacent ICI links, and the per-tick activation hop crosses one link
    only; ``model`` is innermost so Megatron all-reduces ride the shortest
    hops (same ordering rationale as parallel/mesh.py::make_mesh)."""
    devices = devices if devices is not None else jax.devices()
    n = n_pipe * n_data * n_model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    shape, names = [n_pipe], [PIPE_AXIS]
    if n_data > 1:
        shape.append(n_data)
        names.append("data")
    if n_model > 1:
        shape.append(n_model)
        names.append("model")
    if len(shape) == 1:
        return Mesh(np.asarray(devices[:n]), (PIPE_AXIS,))
    return Mesh(np.asarray(devices[:n]).reshape(shape), tuple(names))


def stack_stage_params(per_stage: list[Pytree]) -> Pytree:
    """Stack S structurally-identical per-stage param trees into one tree
    with a leading (S, ...) stage dim — the layout ``pipeline_apply``
    shards over the ``pipe`` axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_stage)


def pipeline_apply(
    stage_fn: Callable[..., Pytree],
    stacked_params: Pytree,
    micro_inputs: Pytree,
    mesh: Mesh,
    *,
    side_inputs: Pytree | None = None,
    micro_spec: P = P(),
    side_spec: P = P(),
    check_rep: bool = False,
    auto: frozenset[str] = frozenset(),
) -> Pytree:
    """Run M microbatches through S pipeline stages.

    stage_fn(stage_params, x) -> y: applies ONE stage (e.g. depth/S
    conformer blocks). Its output must have the same pytree structure and
    shapes as its input (homogeneous stack) — pass-through fields (pad
    masks, etc.) are fine, they just ride along the pipe hops.

    stacked_params: pytree with leading stage dim S on every leaf
    (see ``stack_stage_params``); sharded over ``pipe`` so each device
    keeps only its stage.

    micro_inputs: pytree with leading microbatch dim M on every leaf.
    Replicated to all stages (only stage 0 reads it); at the scales where
    pp matters, inputs are token ids — bytes are negligible vs weights.

    side_inputs: optional pytree with leading microbatch dim M; when given,
    stage_fn is called as ``stage_fn(stage_params, x, side)`` where every
    stage receives the slice for the microbatch IT is currently processing
    (tick t, stage s -> microbatch t-s). Use this for per-position data
    that interior stages need (injection features, pad masks): unlike
    riding it through the x pytree, side inputs never hop on ppermute.
    Replicated across ``pipe``.

    micro_spec: PartitionSpec for the microbatch tree over the mesh's OTHER
    axes (dp x pp composition: e.g. P(None, "data") on a (pipe, data) mesh
    shards the per-microbatch batch dim over data replicas of every stage).
    Must not shard dim 0 (the microbatch dim — that is the pipe's time axis)
    and must not mention the pipe axis. Outputs use the same spec.

    side_spec: same contract for side_inputs (default: replicated). When
    micro_spec shards the per-microbatch batch dim, side inputs whose
    per-stage slices combine elementwise with activations MUST be sharded
    the same way, or per-device batch dims disagree inside stage_fn.

    auto: mesh axis names left to GSPMD (partial-auto shard_map). The pipe
    schedule stays MANUAL (explicit ppermute hops); over ``auto`` axes the
    compiler propagates whatever shardings the operands carry and inserts
    the collectives — this is how tensor parallelism composes with the
    pipe: shard the stacked stage params' matmul dims over a ``model``
    axis (with_sharding_constraint) and list ``model`` here, and each
    stage's matmuls run Megatron-style without stage_fn changing.

    Returns the stage-(S-1) outputs, (M, ...) per leaf, replicated across
    ``pipe`` (and sharded per ``micro_spec`` over the other axes).
    """
    assert len(micro_spec) == 0 or micro_spec[0] is None, (
        "micro_spec must leave the leading microbatch dim unsharded"
    )
    assert PIPE_AXIS not in jax.tree_util.tree_leaves(tuple(micro_spec)), (
        "micro_spec must not use the pipe axis"
    )
    n_pipe = mesh.shape[PIPE_AXIS]
    n_micro = jax.tree_util.tree_leaves(micro_inputs)[0].shape[0]
    assert n_micro >= 1
    ticks = n_micro + n_pipe - 1

    def run(params, xs, sides):
        # params: this device's (1, ...) stage slice; drop the stage dim.
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        stage = jax.lax.axis_index(PIPE_AXIS)
        perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]
        zero = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape[1:], x.dtype), xs
        )

        def tick(buf, t):
            # stage 0 pulls microbatch t from the feed (clipped: after M
            # ticks it re-reads the last one, whose output is discarded);
            # later stages consume the activation ppermuted in last tick.
            feed = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, jnp.minimum(t, n_micro - 1), 0, keepdims=False
                ),
                xs,
            )
            x_in = jax.tree_util.tree_map(
                lambda f, b: jnp.where(stage == 0, f, b), feed, buf
            )
            if sides is None:
                y = stage_fn(params, x_in)
            else:
                # tick t, stage s computes microbatch t - s (clipped during
                # warmup/drain ticks whose outputs are discarded anyway)
                s_idx = jnp.clip(t - stage, 0, n_micro - 1)
                side_t = jax.tree_util.tree_map(
                    lambda x: jax.lax.dynamic_index_in_dim(
                        x, s_idx, 0, keepdims=False
                    ),
                    sides,
                )
                y = stage_fn(params, x_in, side_t)
            buf_next = jax.lax.ppermute(y, PIPE_AXIS, perm)
            return buf_next, y

        _, ys = jax.lax.scan(tick, zero, jnp.arange(ticks))
        # only the last stage's outputs are the model's outputs; mask and
        # psum to replicate them to every stage (one all-reduce at the end).
        # Exact for every dtype: non-last stages contribute zeros, so the
        # sum IS the last stage's value (ints stay exact — no f32 cast;
        # bools ride as int32).
        is_last = stage == n_pipe - 1

        def select_last(y):
            masked = jnp.where(is_last, y, jnp.zeros_like(y))
            if y.dtype == jnp.bool_:
                return jax.lax.psum(
                    masked.astype(jnp.int32), PIPE_AXIS
                ).astype(jnp.bool_)
            return jax.lax.psum(masked, PIPE_AXIS)

        ys = jax.tree_util.tree_map(select_last, ys)
        # tick t delivers microbatch t-(S-1) out of the last stage
        return jax.tree_util.tree_map(lambda y: y[n_pipe - 1 :], ys)

    if auto:
        # partial-auto (jax.shard_map axis_names=): the pipe schedule (and
        # any data axis) stays manual; axes in ``auto`` are left to GSPMD,
        # which partitions each stage's matmuls per the operands' shardings.
        manual = frozenset(mesh.axis_names) - frozenset(auto)
        if side_inputs is None:
            return jax.shard_map(
                lambda p, xs: run(p, xs, None),
                mesh=mesh, axis_names=manual,
                in_specs=(P(PIPE_AXIS), micro_spec),
                out_specs=micro_spec, check_vma=check_rep,
            )(stacked_params, micro_inputs)
        return jax.shard_map(
            run,
            mesh=mesh, axis_names=manual,
            in_specs=(P(PIPE_AXIS), micro_spec, side_spec),
            out_specs=micro_spec, check_vma=check_rep,
        )(stacked_params, micro_inputs, side_inputs)
    if side_inputs is None:
        return shard_map(
            lambda p, xs: run(p, xs, None),
            mesh=mesh,
            in_specs=(P(PIPE_AXIS), micro_spec),
            out_specs=micro_spec,
            check_rep=check_rep,
        )(stacked_params, micro_inputs)
    return shard_map(
        run,
        mesh=mesh,
        in_specs=(P(PIPE_AXIS), micro_spec, side_spec),
        out_specs=micro_spec,
        check_rep=check_rep,
    )(stacked_params, micro_inputs, side_inputs)
