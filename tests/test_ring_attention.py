"""Ring attention (ops/ring_attention.py) matches dense attention exactly.

The ring only re-orders WHICH key/value block each device sees at each
step; the online-softmax accumulation makes the result mathematically
identical to one dense softmax over the full sequence. Pinned here against
``mha_reference`` on the virtual 8-device CPU mesh: forward (with and
without key-padding masks, including a fully-masked row, which both
implementations resolve to uniform attention), gradients, and bf16 inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.ops.attention import mha_reference
from edm_tts_tpu.ops.ring_attention import make_seq_mesh, ring_mha

B, T, H, D = 2, 32, 3, 8


def _qkv(key, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    shape = (B, T, H, D)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.mark.parametrize("n_seq", [2, 4, 8])
def test_ring_matches_dense(n_seq):
    q, k, v = _qkv(jax.random.PRNGKey(0))
    mesh = make_seq_mesh(n_seq, devices=jax.devices()[:n_seq])
    out = jax.jit(lambda q, k, v: ring_mha(q, k, v, mesh=mesh))(q, k, v)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_with_mask_and_fully_masked_row():
    q, k, v = _qkv(jax.random.PRNGKey(1))
    mask = jax.random.bernoulli(jax.random.PRNGKey(2), 0.7, (B, T))
    mask = mask.at[1, :].set(False)  # a fully-masked row: uniform attention
    mesh = make_seq_mesh(4, devices=jax.devices()[:4])
    out = jax.jit(lambda q, k, v, m: ring_mha(q, k, v, mesh=mesh, mask=m))(
        q, k, v, mask
    )
    ref = mha_reference(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_gradients_match_dense():
    q, k, v = _qkv(jax.random.PRNGKey(3))
    mask = jax.random.bernoulli(jax.random.PRNGKey(4), 0.8, (B, T))
    mesh = make_seq_mesh(4, devices=jax.devices()[:4])

    def ring_loss(q, k, v):
        return jnp.mean(jnp.square(ring_mha(q, k, v, mesh=mesh, mask=mask)))

    def dense_loss(q, k, v):
        return jnp.mean(jnp.square(mha_reference(q, k, v, mask=mask)))

    g_ring = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
    g_dense = jax.jit(jax.grad(dense_loss, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_ring_bf16():
    q, k, v = _qkv(jax.random.PRNGKey(5), jnp.bfloat16)
    mesh = make_seq_mesh(2, devices=jax.devices()[:2])
    out = jax.jit(lambda q, k, v: ring_mha(q, k, v, mesh=mesh))(q, k, v)
    assert out.dtype == jnp.bfloat16
    ref = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)
