"""MXU-friendly embedding/CE ops (ops/embedding.py): value and gradient
parity against the plain gather/take_along_axis formulations they replace
(reference surfaces: modeling_text_to_semantic.py:126-134 masked CE and the
torch embedding backward)."""

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.ops import embed_take, masked_cross_entropy


def test_embed_take_value_and_grads_match_plain_gather():
    rng = jax.random.PRNGKey(0)
    table = jax.random.normal(rng, (11, 6))
    ids = jax.random.randint(jax.random.PRNGKey(1), (3, 5), 0, 11)
    g_seed = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 6))

    def via_op(t):
        return jnp.sum(embed_take(t, ids) * g_seed)

    def via_gather(t):
        return jnp.sum(jnp.take(t, ids, axis=0) * g_seed)

    np.testing.assert_allclose(via_op(table), via_gather(table), rtol=1e-6)
    d_op = jax.grad(via_op)(table)
    d_ref = jax.grad(via_gather)(table)
    np.testing.assert_allclose(np.asarray(d_op), np.asarray(d_ref), atol=1e-5)
    # repeated ids must accumulate (the scatter-add semantics)
    ids_rep = jnp.zeros((4,), jnp.int32)
    d_rep = jax.grad(lambda t: jnp.sum(embed_take(t, ids_rep)))(table)
    assert np.allclose(np.asarray(d_rep)[0], 4.0)
    assert np.allclose(np.asarray(d_rep)[1:], 0.0)


def test_masked_cross_entropy_matches_take_along_axis():
    rng = jax.random.PRNGKey(3)
    logits = jax.random.normal(rng, (2, 7, 13))
    labels = jax.random.randint(jax.random.PRNGKey(4), (2, 7), 0, 13)
    mask = jax.random.bernoulli(jax.random.PRNGKey(5), 0.6, (2, 7))

    def ref(lg):
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        m = mask.astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1)

    got = masked_cross_entropy(logits, labels, mask)
    np.testing.assert_allclose(got, ref(logits), rtol=1e-5)
    d_got = jax.grad(lambda lg: masked_cross_entropy(lg, labels, mask))(logits)
    d_ref = jax.grad(ref)(logits)
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref), atol=1e-5)


def test_masked_cross_entropy_all_masked_is_finite():
    logits = jnp.ones((1, 4, 8))
    labels = jnp.zeros((1, 4), jnp.int32)
    none = jnp.zeros((1, 4), bool)
    assert float(masked_cross_entropy(logits, labels, none)) == 0.0
    d = jax.grad(lambda lg: masked_cross_entropy(lg, labels, none))(logits)
    assert np.all(np.isfinite(np.asarray(d)))


def test_embed_take_bf16_table_grad_dtype():
    table = jnp.ones((5, 4), jnp.bfloat16)
    ids = jnp.array([1, 1, 2])
    d = jax.grad(
        lambda t: jnp.sum(embed_take(t, ids).astype(jnp.float32))
    )(table)
    assert d.dtype == jnp.bfloat16
    assert np.allclose(np.asarray(d, np.float32)[1], 2.0)
