"""Pipeline parallelism (parallel/pipeline.py) computes EXACTLY what the
sequential block stack computes — forward and gradients.

The GPipe schedule only reorders when each (stage, microbatch) pair runs
and moves activations across devices with ppermute; the math per microbatch
is untouched. These tests pin that on the 8-virtual-CPU-device mesh with a
tiny conformer: 4 stages x 1 block and 2 stages x 2 blocks, forward equality
vs ``Conformer.apply`` and gradient equality vs the sequential stack
(jax.grad straight through shard_map + scan + ppermute).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.models.conformer.conformer import (
    Conformer,
    ConformerBlock,
    ConformerConfig,
)
from edm_tts_tpu.ops import rope_frequencies
from edm_tts_tpu.parallel.pipeline import (
    make_pipe_mesh,
    pipeline_apply,
    stack_stage_params,
)

CFG = ConformerConfig(dim=16, depth=4, dim_head=8, heads=2,
                      conv_kernel_size=7)
M, MB, T = 4, 2, 12  # microbatches, microbatch size, sequence length


def _init():
    model = Conformer(CFG)
    x = jnp.zeros((1, T, CFG.dim))
    params = model.init(jax.random.PRNGKey(0), x)
    block_params = [params["params"][f"block_{i}"] for i in range(CFG.depth)]
    return model, params, block_params


def _stage_fn(layers_per_stage):
    block = ConformerBlock(CFG)
    rope = rope_frequencies(T, CFG.dim_head)

    def stage_fn(stage_params, x):
        # stage_params: (layers_per_stage, ...) block stack for THIS stage
        def body(x, bp):
            return block.apply({"params": bp}, x, rope=rope), None

        x, _ = jax.lax.scan(body, x, stage_params)
        return x

    return stage_fn


@pytest.mark.parametrize("n_stages", [4, 2])
def test_pipeline_forward_matches_sequential(n_stages):
    model, params, block_params = _init()
    lps = CFG.depth // n_stages
    x = jax.random.normal(jax.random.PRNGKey(1), (M, MB, T, CFG.dim))

    ref = model.apply(params, x.reshape(M * MB, T, CFG.dim))
    ref = ref.reshape(M, MB, T, CFG.dim)

    mesh = make_pipe_mesh(n_stages, devices=jax.devices()[:n_stages])
    stacked = stack_stage_params(
        [
            stack_stage_params(block_params[s * lps : (s + 1) * lps])
            for s in range(n_stages)
        ]
    )
    out = jax.jit(
        lambda p, x: pipeline_apply(_stage_fn(lps), p, x, mesh)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential():
    model, params, block_params = _init()
    n_stages, lps = 4, 1
    x = jax.random.normal(jax.random.PRNGKey(2), (M, MB, T, CFG.dim))
    mesh = make_pipe_mesh(n_stages, devices=jax.devices()[:n_stages])
    stacked = stack_stage_params(
        [stack_stage_params([bp]) for bp in block_params]
    )

    def pp_loss(p):
        out = pipeline_apply(_stage_fn(lps), p, x, mesh)
        return jnp.mean(jnp.square(out))

    def seq_loss(p):
        out = model.apply(p, x.reshape(M * MB, T, CFG.dim))
        return jnp.mean(jnp.square(out))

    g_pp = jax.jit(jax.grad(pp_loss))(stacked)
    g_seq = jax.jit(jax.grad(seq_loss))(params)
    for i in range(n_stages):
        got = jax.tree_util.tree_map(lambda a: a[i, 0], g_pp)
        want = g_seq["params"][f"block_{i}"]
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)


def test_pipeline_composes_with_data_parallel():
    """pp x dp on a (pipe=4, data=2) mesh: each stage is replicated across
    two data shards that each carry half of every microbatch
    (micro_spec=P(None, "data")); numerics still match sequential."""
    from jax.sharding import PartitionSpec as P

    model, params, block_params = _init()
    n_stages = 4
    x = jax.random.normal(jax.random.PRNGKey(3), (M, MB, T, CFG.dim))
    ref = model.apply(params, x.reshape(M * MB, T, CFG.dim))
    ref = ref.reshape(M, MB, T, CFG.dim)

    mesh = make_pipe_mesh(n_stages, n_data=2, devices=jax.devices()[:8])
    stacked = stack_stage_params(
        [stack_stage_params([bp]) for bp in block_params]
    )
    out = jax.jit(
        lambda p, x: pipeline_apply(
            _stage_fn(1), p, x, mesh, micro_spec=P(None, "data")
        )
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_passthrough_pytree():
    """Activation pytrees ride the pipe: a pass-through field (e.g. a pad
    mask) reaches every stage unchanged and comes back out intact."""
    n_stages = 2

    def stage_fn(w, act):
        return {"x": act["x"] * w[0] + act["m"], "m": act["m"],
                "ids": act["ids"], "flag": act["flag"]}

    mesh = make_pipe_mesh(n_stages, devices=jax.devices()[:n_stages])
    w = jnp.asarray([[2.0], [3.0]])  # stage 0 doubles, stage 1 triples
    x = jnp.arange(6.0).reshape(3, 2)  # M=3 microbatches of shape (2,)
    m = jnp.ones((3, 2))
    # int32 beyond f32's 2^24 integer range and bools must survive the
    # final replication psum exactly
    ids = jnp.asarray([[2**24 + 1, 2**30 - 3]] * 3, jnp.int32)
    flag = jnp.asarray([[True, False]] * 3)
    out = pipeline_apply(
        stage_fn, w, {"x": x, "m": m, "ids": ids, "flag": flag}, mesh
    )
    np.testing.assert_allclose(np.asarray(out["x"]), (x * 2 + 1) * 3 + 1)
    np.testing.assert_allclose(np.asarray(out["m"]), np.asarray(m))
    np.testing.assert_array_equal(np.asarray(out["ids"]), np.asarray(ids))
    assert out["flag"].dtype == jnp.bool_
    np.testing.assert_array_equal(np.asarray(out["flag"]), np.asarray(flag))
