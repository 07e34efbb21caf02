"""Pipeline parallelism on the flagship: the s2a injection-conformer
training forward — interior-layer teacher injections, the residual re-add
quirk, coarse outputs feeding the logits head — runs as a GPipe pipeline
(models/s2a/pipeline.py over parallel/pipeline.py) and computes EXACTLY the
sequential model's logits, loss and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.models.codec import CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.models.s2a.pipeline import (
    pipelined_forward_logits,
    prepare_train_inputs,
)
from edm_tts_tpu.ops.embedding import masked_cross_entropy
from edm_tts_tpu.parallel.pipeline import make_pipe_mesh

CFG = S2AConfig(
    hidden_size=48,
    num_semantic_tokens=32,
    encoder_num_heads=2,
    encoder_num_layers=4,
    injection_layers=(1, 2),
    encoder_attn_dropout=0.0,
    encoder_ff_dropout=0.0,
    encoder_conv_dropout=0.0,
    codec=CodecConfig(
        encoder_dim=8,
        decoder_dim=32,
        n_codebooks=4,
        codebook_size=32,
        codebook_dim=4,
        quantizer_dropout=0.0,
    ),
)
B, T, M = 4, 16, 2  # batch, frames, microbatches


def _setup():
    model = InjectionConformer(CFG)
    rng = jax.random.PRNGKey(0)
    ac = jax.random.randint(
        jax.random.PRNGKey(1), (B, CFG.num_quantizers, T), 0,
        CFG.codec.codebook_size,
    )
    sem = jax.random.randint(
        jax.random.PRNGKey(2), (B, T), 0, CFG.num_semantic_tokens
    )
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.6, (B, T))
    params = jax.jit(
        lambda r: model.init(r, ac[:1, :, :8], sem[:1, :8], mask_rng=r, train=False)
    )(rng)
    return model, params, ac, sem, mask


@pytest.mark.parametrize("n_pipe", [4, 2])
def test_pipelined_s2a_logits_match_sequential(n_pipe):
    model, params, ac, sem, mask = _setup()
    enc_in, teacher = prepare_train_inputs(model, params, ac, sem, mask)
    ref = model.apply(
        params, enc_in, teacher_injections=teacher, method="forward_logits"
    )
    mesh = make_pipe_mesh(n_pipe)
    logits = jax.jit(
        lambda p, e, tch: pipelined_forward_logits(
            model, p, e, tch, mesh, n_micro=M
        )
    )(params, enc_in, teacher)
    assert logits.shape == ref.shape
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=2e-5)


def test_pipelined_s2a_loss_and_grads_match_sequential():
    model, params, ac, sem, mask = _setup()

    def loss_seq(p):
        out = model.apply(
            p, ac, sem, mask_rng=jax.random.PRNGKey(9), mask_override=mask,
            train=False,
        )
        return out["loss"]

    mesh = make_pipe_mesh(4)

    def loss_pp(p):
        enc_in, teacher = prepare_train_inputs(model, p, ac, sem, mask)
        logits = pipelined_forward_logits(model, p, enc_in, teacher, mesh, n_micro=M)
        targets = ac.astype(jnp.int32)
        loss_mask = jnp.broadcast_to(mask[:, None, :], targets.shape)
        return masked_cross_entropy(logits, targets, loss_mask)

    l_ref, g_ref = jax.value_and_grad(loss_seq)(params)
    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pp))(params)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-6)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_pp, _ = jax.tree_util.tree_flatten(g_pp)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_pipelined_s2a_composes_with_data_parallel():
    """dp x pp: the same program on a (pipe=4, data=2) mesh with each
    microbatch's batch dim sharded over data replicas (micro_spec/side_spec)
    matches the sequential logits, loss and grads."""
    from jax.sharding import PartitionSpec as P

    model, params, ac, sem, mask = _setup()
    enc_in, teacher = prepare_train_inputs(model, params, ac, sem, mask)
    ref = model.apply(
        params, enc_in, teacher_injections=teacher, method="forward_logits"
    )
    mesh = make_pipe_mesh(4, n_data=2)
    logits = jax.jit(
        lambda p, e, tch: pipelined_forward_logits(
            model, p, e, tch, mesh, n_micro=M, micro_spec=P(None, "data")
        )
    )(params, enc_in, teacher)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=2e-5)

    def loss_dpp(p):
        enc, tch = prepare_train_inputs(model, p, ac, sem, mask)
        lg = pipelined_forward_logits(
            model, p, enc, tch, mesh, n_micro=M, micro_spec=P(None, "data")
        )
        targets = ac.astype(jnp.int32)
        loss_mask = jnp.broadcast_to(mask[:, None, :], targets.shape)
        return masked_cross_entropy(lg, targets, loss_mask)

    def loss_seq(p):
        out = model.apply(
            p, ac, sem, mask_rng=jax.random.PRNGKey(9), mask_override=mask,
            train=False,
        )
        return out["loss"]

    l_ref, g_ref = jax.value_and_grad(loss_seq)(params)
    l_d, g_d = jax.jit(jax.value_and_grad(loss_dpp))(params)
    np.testing.assert_allclose(float(l_d), float(l_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_d),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_pipelined_s2a_composes_with_tensor_parallel():
    """tp x pp: the same pipe program on a (pipe=4, model=2) mesh with the
    stacked stage params Megatron-sharded over ``model`` (partial-auto
    shard_map, GSPMD partitions each stage's matmuls) matches the
    sequential logits, loss and grads."""
    model, params, ac, sem, mask = _setup()
    enc_in, teacher = prepare_train_inputs(model, params, ac, sem, mask)
    ref = model.apply(
        params, enc_in, teacher_injections=teacher, method="forward_logits"
    )
    mesh = make_pipe_mesh(4, n_model=2)
    auto = frozenset({"model"})
    logits = jax.jit(
        lambda p, e, tch: pipelined_forward_logits(
            model, p, e, tch, mesh, n_micro=M, auto=auto
        )
    )(params, enc_in, teacher)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=2e-5)

    def loss_tpp(p):
        enc, tch = prepare_train_inputs(model, p, ac, sem, mask)
        lg = pipelined_forward_logits(
            model, p, enc, tch, mesh, n_micro=M, auto=auto
        )
        targets = ac.astype(jnp.int32)
        loss_mask = jnp.broadcast_to(mask[:, None, :], targets.shape)
        return masked_cross_entropy(lg, targets, loss_mask)

    def loss_seq(p):
        out = model.apply(
            p, ac, sem, mask_rng=jax.random.PRNGKey(9), mask_override=mask,
            train=False,
        )
        return out["loss"]

    l_ref, g_ref = jax.value_and_grad(loss_seq)(params)
    l_t, g_t = jax.jit(jax.value_and_grad(loss_tpp))(params)
    np.testing.assert_allclose(float(l_t), float(l_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_t),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
