"""Pipeline-parallel training forward for the s2a injection conformer.

Runs the flagship 16-block injection walk (models/s2a/model.py::_run_stack,
reference injection_conformer_wrapper.py:92-150) through the GPipe executor
(parallel/pipeline.py): blocks split into S homogeneous stages along a
``pipe`` mesh axis, M microbatches streamed with ppermute hops, ONE compiled
differentiable program. The reference has no pipeline story at all (its
largest model fits one GPU); this is the pod-scale extension for when the
stack outgrows a chip.

What makes s2a harder than a plain block stack — and how each is mapped:

- **Teacher injections at interior layers** (4,7,10,13): the projected
  injections are input-independent, so they are computed OUTSIDE the pipe
  (grads still flow to the projection weights) and delivered to the stage
  that needs them via ``pipeline_apply``'s side inputs — they never ride
  the ppermute hops.
- **Per-layer branching** (inject or not, which injection index): the pipe
  runs ONE SPMD program on every device, so the branch is data-driven —
  static per-layer tables indexed by the traced global layer id
  ``stage * layers_per_stage + j``, with predicated (where / no-op
  dynamic-update) injection adds. Non-injection layers compute the same
  (cheap) predicated ops and discard them.
- **Coarse pre-injection outputs feed the logits head at the end**: a
  ``(Qc, T, H)`` coarse buffer rides the pipe alongside the activation —
  that is real dataflow (stage s produces them, the head consumes them
  after stage S-1), so it must hop.
- **The residual re-add quirk** (cur + injection + PREVIOUS coarse output,
  reference wrapper.py:117-124) reads the ride-along buffer at idx-1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from edm_tts_tpu.models.conformer.conformer import ConformerBlock
from edm_tts_tpu.ops import rope_frequencies
from edm_tts_tpu.parallel.pipeline import (
    PIPE_AXIS,
    pipeline_apply,
    stack_stage_params,
)

Array = jax.Array


def _stacked_tp_constraint(stacked, mesh):
    """Sharding-constrain the (S, lps, ...) stacked block params for tp x pp:
    stage dim over ``pipe``, matmul dims over ``model`` per the same Megatron
    rules as parallel/mesh.py::_tp_spec_for (dims offset by the two leading
    stack dims). GSPMD then runs each stage's matmuls tensor-parallel inside
    the manual pipe program (pipeline_apply ``auto={'model'}``)."""
    from jax.sharding import NamedSharding
    from edm_tts_tpu.parallel.mesh import _path_str, _tp_spec_for

    n_model = mesh.shape.get("model", 1)

    def pick(path, x):
        spec = [PIPE_AXIS, None] + [None] * (x.ndim - 2)
        if n_model > 1:
            # reuse the flat-param rule on the unstacked trailing shape
            flat = jax.ShapeDtypeStruct(x.shape[2:], x.dtype)
            tp = _tp_spec_for("/block_0/" + _path_str(path), flat, n_model, 1)
            if tp is not None:
                spec[2:] = list(tp)
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec))
        )

    return jax.tree_util.tree_map_with_path(pick, stacked)


def prepare_train_inputs(model, params, acoustic_tokens, semantic_tokens, mask):
    """The training front-end exactly as ``InjectionConformer.__call__``:
    masked encoder input + raw (cumsum) teacher injections ``(Qc, B, T, D)``."""

    def _prep(m, ac, sem, mask):
        sem_e = m.embed_semantic(sem)
        un = m.acoustic_features_unreduced(ac)
        a0 = m.acoustic_feat_proj(un[:, 0].astype(m.dtype))
        enc = jnp.where(mask[:, :, None], sem_e + m.mask_token_value(), sem_e + a0)
        cum = jnp.cumsum(un, axis=1)
        teacher = jnp.stack(
            [cum[:, i] for i in range(len(m.cfg.injection_layers))], axis=0
        )
        return enc, teacher

    return model.apply(
        params, acoustic_tokens, semantic_tokens, mask, method=_prep
    )


def pipelined_forward_logits(
    model,
    params,
    enc_in: Array,
    teacher: Array,
    mesh: Mesh,
    *,
    n_micro: int,
    micro_spec: P = P(),
    auto: frozenset[str] = frozenset(),
) -> Array:
    """Teacher-forced training logits ``(B, Q, T, N)`` == the sequential
    ``forward_logits(enc_in, teacher_injections=teacher, train=...)`` (the
    training path passes no pad mask — quirk preserved), computed as a GPipe
    pipeline over ``mesh``'s ``pipe`` axis with ``n_micro`` microbatches.

    Differentiable end-to-end: stage stacking happens inside, so
    ``jax.grad`` w.r.t. ``params`` reaches the block weights through the
    pipe and the head/projection weights outside it.

    ``micro_spec`` composes dp x pp on a ``(pipe, data)`` mesh
    (parallel/pipeline.py::make_pipe_mesh): e.g. ``P(None, "data")``
    shards each microbatch's batch dim over every stage's data replicas.
    ``auto={"model"}`` composes tp x pp on a ``(pipe, ..., "model")`` mesh:
    stacked stage params get Megatron sharding constraints
    (_stacked_tp_constraint) and GSPMD partitions each stage's matmuls
    over ``model`` inside the manual pipe program.
    """
    cfg = model.cfg
    depth = cfg.encoder_num_layers
    n_pipe = mesh.shape[PIPE_AXIS]
    if depth % n_pipe:
        raise ValueError(f"depth {depth} not divisible by {n_pipe} stages")
    lps = depth // n_pipe
    if not (cfg.use_injection and cfg.residual):
        raise ValueError(
            "pipelined_forward_logits implements the flagship "
            "use_injection+residual semantics"
        )
    inj_layers = tuple(cfg.injection_layers)
    qc = len(inj_layers)

    onehot = np.zeros(depth, np.bool_)
    idx_map = np.zeros(depth, np.int32)
    for i, layer in enumerate(inj_layers):
        onehot[layer] = True
        idx_map[layer] = i
    onehot = jnp.asarray(onehot)
    idx_map = jnp.asarray(idx_map)

    # Projected injections are input-independent: compute them outside the
    # pipe and hand each stage its microbatch's slice as a side input.
    def _proj(m, teacher):
        return jnp.stack(
            [m.project_injection[i](teacher[i].astype(m.dtype)) for i in range(qc)],
            axis=0,
        )  # (Qc, B, T, H)

    proj = model.apply(params, teacher, method=_proj)

    b, t, h = enc_in.shape
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by {n_micro} microbatches")
    mb = b // n_micro

    blocks = [params["params"][f"block_{i}"] for i in range(depth)]
    stacked = stack_stage_params(
        [stack_stage_params(blocks[s * lps : (s + 1) * lps]) for s in range(n_pipe)]
    )  # (S, lps, ...) per leaf
    if auto:
        stacked = _stacked_tp_constraint(stacked, mesh)

    micro = {
        "x": enc_in.reshape(n_micro, mb, t, h),
        "coarse": jnp.zeros((n_micro, mb, qc, t, h), enc_in.dtype),
    }
    side = {
        "inj": jnp.moveaxis(proj, 0, 1).reshape(n_micro, mb, qc, t, h)
    }

    rope = rope_frequencies(t, cfg.encoder_config.dim_head)
    block = ConformerBlock(cfg.encoder_config, dtype=model.dtype)

    def stage_fn(stage_params, xt, side_t):
        stage = jax.lax.axis_index(PIPE_AXIS)

        def body(carry, scanned):
            bp, j = scanned
            x, coarse = carry
            g = stage * lps + j
            cur = block.apply({"params": bp}, x, rope=rope)
            is_inj = onehot[g]
            idx = idx_map[g]
            # residual re-add: the PREVIOUS injection layer's pre-injection
            # output (zero for the first injection layer)
            prev = jax.lax.dynamic_index_in_dim(
                coarse, jnp.maximum(idx - 1, 0), 1, keepdims=False
            )
            residual = jnp.where(idx >= 1, prev, jnp.zeros_like(prev))
            # record the pre-injection output (no-op write on non-inj layers:
            # idx is 0 there and upd == coarse[:, 0])
            old = jax.lax.dynamic_index_in_dim(coarse, idx, 1, keepdims=False)
            upd = jnp.where(is_inj, cur, old)
            coarse = jax.lax.dynamic_update_index_in_dim(coarse, upd, idx, 1)
            inj_g = jax.lax.dynamic_index_in_dim(
                side_t["inj"], idx, 1, keepdims=False
            )
            add = jnp.where(is_inj, inj_g + residual, jnp.zeros_like(cur))
            return (cur + add, coarse), None

        (x, coarse), _ = jax.lax.scan(
            body, (xt["x"], xt["coarse"]), (stage_params, jnp.arange(lps))
        )
        return {"x": x, "coarse": coarse}

    out = pipeline_apply(
        stage_fn, stacked, micro, mesh, side_inputs=side,
        micro_spec=micro_spec, side_spec=micro_spec, auto=auto,
    )
    final = out["x"].reshape(b, t, h)
    coarse = out["coarse"].reshape(b, qc, t, h)
    coarse_btqh = jnp.transpose(coarse, (0, 2, 1, 3))  # (B, T, Qc, H)

    def _head(m, final, coarse_btqh):
        bb, tt, hh = final.shape
        fine = m.fine_head(final).reshape(bb, tt, m.remaining_quantizers, hh)
        return m.to_logits(jnp.concatenate([coarse_btqh, fine], axis=2))

    return model.apply(params, final, coarse_btqh, method=_head)
