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
