"""Conformer backbone shape/behavior tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.models.conformer import Conformer, ConformerConfig

CFG = ConformerConfig(dim=32, depth=2, dim_head=8, heads=4, conv_kernel_size=5)


@pytest.fixture(scope="module")
def model_and_params():
    model = Conformer(CFG)
    x = jnp.zeros((1, 16, 32))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    return model, params


def test_conformer_shapes_and_finite(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    y = jax.jit(model.apply)(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_conformer_early_exit(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32))
    apply = jax.jit(model.apply, static_argnames=("output_layer_idx",))
    y0 = apply(params, x, output_layer_idx=0)
    y_full = apply(params, x)
    assert y0.shape == y_full.shape
    assert not np.allclose(np.asarray(y0), np.asarray(y_full))


def test_key_padding_mask_blocks_padding_influence():
    """With ONE block, attention is fully masked and only the unmasked
    depthwise conv (k=5) leaks pad content into the last k//2 valid
    positions — identical to the reference conformer (its conv module is
    unmasked too, conformer.py:158-180). Positions further than k//2 from
    the pad boundary must be invariant to pad content."""
    cfg = ConformerConfig(dim=32, depth=1, dim_head=8, heads=4, conv_kernel_size=5)
    model = Conformer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 32))
    params = jax.jit(model.init)(jax.random.PRNGKey(3), x)
    mask = jnp.arange(16)[None, :] < 10
    x2 = x.at[:, 10:].set(jax.random.normal(jax.random.PRNGKey(4), (1, 6, 32)))
    apply = jax.jit(model.apply)
    y1 = apply(params, x, mask=mask)
    y2 = apply(params, x2, mask=mask)
    np.testing.assert_allclose(
        np.asarray(y1[:, :8]), np.asarray(y2[:, :8]), atol=1e-5, rtol=1e-4
    )


def test_rope_translation_sensitivity(model_and_params):
    """RoPE makes attention position-aware: permuting inputs must not simply
    permute outputs (unlike a no-positional-encoding transformer)."""
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 32))
    apply = jax.jit(model.apply)
    y = apply(params, x)
    perm = jnp.array([3, 2, 1, 0, 7, 6, 5, 4, 11, 10, 9, 8, 15, 14, 13, 12])
    y_perm = apply(params, x[:, perm])
    assert not np.allclose(np.asarray(y[:, perm]), np.asarray(y_perm), atol=1e-4)
