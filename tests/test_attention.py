"""Attention kernel parity: XLA path and Pallas kernel vs plain einsum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.ops.attention import mha, mha_reference
from edm_tts_tpu.ops.pallas_attention import flash_mha


def _qkv(key, b=2, t=24, h=4, d=16):
    ks = jax.random.split(key, 3)
    shape = (b, t, h, d)
    return tuple(jax.random.normal(k, shape) * 0.5 for k in ks)


def test_xla_mha_matches_reference():
    q, k, v = _qkv(jax.random.PRNGKey(0))
    mask = jnp.arange(24)[None, :] < jnp.array([[20], [13]])
    out = mha(q, k, v, mask=mask)
    ref = mha_reference(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_pallas_mha_matches_reference():
    q, k, v = _qkv(jax.random.PRNGKey(1))
    out = flash_mha(q, k, v, block_q=16, interpret=True)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_pallas_mha_masked_matches_reference():
    q, k, v = _qkv(jax.random.PRNGKey(2))
    mask = jnp.arange(24)[None, :] < jnp.array([[17], [24]])
    out = flash_mha(q, k, v, mask=mask, block_q=16, interpret=True)
    ref = mha_reference(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_pallas_mha_ragged_block():
    """T not divisible by block_q exercises the query padding path."""
    q, k, v = _qkv(jax.random.PRNGKey(3), t=19)
    out = flash_mha(q, k, v, block_q=16, interpret=True)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def _grad_check(key, t, mask=None, block_q=16):
    """Pallas custom-VJP grads vs autodiff through the einsum reference."""
    from edm_tts_tpu.ops.pallas_attention import flash_mha_diff

    q, k, v = _qkv(key, t=t)
    g_seed = jax.random.normal(jax.random.fold_in(key, 7), q.shape) * 0.3

    def loss_pallas(q, k, v):
        return jnp.sum(flash_mha_diff(q, k, v, mask, block_q, True) * g_seed)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, mask=mask) * g_seed)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gr, "q k v".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_pallas_mha_grads_match_reference():
    _grad_check(jax.random.PRNGKey(4), t=24)


def test_pallas_mha_grads_masked():
    mask = jnp.arange(24)[None, :] < jnp.array([[17], [24]])
    _grad_check(jax.random.PRNGKey(5), t=24, mask=mask)


def test_pallas_mha_grads_ragged_multiblock():
    """Padding paths of BOTH backward kernels (t=35, blocks of 16)."""
    mask = jnp.arange(35)[None, :] < jnp.array([[30], [35]])
    _grad_check(jax.random.PRNGKey(6), t=35, mask=mask)


def test_pallas_masked_keys_get_zero_grads():
    """k/v grads at padded key positions must be exactly zero (those
    positions cannot influence the masked forward)."""
    from edm_tts_tpu.ops.pallas_attention import flash_mha_diff

    q, k, v = _qkv(jax.random.PRNGKey(8), t=24)
    mask = jnp.arange(24)[None, :] < jnp.array([[16], [24]])

    def loss(q, k, v):
        return jnp.sum(flash_mha_diff(q, k, v, mask, 16, True))

    _, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert np.all(np.asarray(dk)[0, 16:] == 0)
    assert np.all(np.asarray(dv)[0, 16:] == 0)


def test_pallas_mha_auto_block_masked_grads():
    """block_q=None picks the auto block size (one-shot block at short T);
    exercises the f32 additive-bias mask path end to end with grads."""
    _grad_check(jax.random.PRNGKey(7), t=40,
                mask=jnp.arange(40)[None, :] < jnp.array([[33], [40]]),
                block_q=None)


def test_auto_block_sizing():
    from edm_tts_tpu.ops.pallas_attention import _auto_block

    assert _auto_block(768, 768) == 768       # one-shot block fits
    assert _auto_block(1408, 1408) == 704     # halved, 64-aligned
    assert _auto_block(1408, 1408) * 1408 * 4 <= 6_500_000
